"""Smoke tests for the interactive CLI entry points (arg parsing + imports)."""

import subprocess
import sys


class TestScripts:
    def test_vqa_help(self):
        out = subprocess.run(
            [sys.executable, "scripts/interactive_vqa.py", "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0
        assert "--checkpoint" in out.stdout

    def test_generator_help(self):
        out = subprocess.run(
            [sys.executable, "scripts/interactive_image_generator.py", "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0
        assert "--cfg-text" in out.stdout

    def test_serve_http_help(self):
        out = subprocess.run(
            [sys.executable, "scripts/serve_http.py", "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0
        for flag in ("--slots", "--t2i", "--act-int8", "--spec"):
            assert flag in out.stdout
