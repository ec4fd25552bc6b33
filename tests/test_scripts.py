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
