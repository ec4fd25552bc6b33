"""scripts/parity_gate.py end-to-end on the synthetic released-format
checkpoint: every step must run (pass or a justified skip), and with --ref the
greedy decode must be token-for-token against the reference implementation."""

import json
import sys

import pytest

from tests.test_checkpoint_e2e import (  # noqa: F401 (fixture re-export)
    ckpt_dir, VAE_SMALL, make_tokenizer_json,
)


def _run_gate(tmp_path, ckpt, extra):
    import scripts.parity_gate as gate

    out = tmp_path / "report.json"
    argv = [
        "parity_gate.py", str(ckpt),
        "--overrides", json.dumps(
            {"max_latent_size": 4, "vit_max_num_patch_per_side": 4}
        ),
        "--vae-config", json.dumps({
            "resolution": 32, "downsample": 4, "ch": 32,
            "ch_mult": [1, 2, 2], "num_res_blocks": 1, "z_channels": 4,
        }),
        "--out", str(out),
    ] + extra
    old = sys.argv
    sys.argv = argv
    try:
        with pytest.raises(SystemExit) as e:
            gate.main()
    finally:
        sys.argv = old
    with open(out) as f:
        report = json.load(f)
    return report, e.value.code


class TestParityGate:
    def test_gate_without_ref(self, tmp_path, ckpt_dir):
        report, code = _run_gate(tmp_path, ckpt_dir, ["--max-tokens", "4"])
        assert code == 0, report
        s = report["steps"]
        assert s["load"]["status"] == "pass"
        assert s["tokenizer"]["status"] == "pass"
        assert s["vqa_greedy"]["status"] == "skip"
        assert s["vae_pixel"]["status"] == "skip"
        assert s["t2i_golden"]["status"] == "pass"
        assert "sha256" in s["t2i_golden"]["stats"]
        assert s["spec_decode"]["status"] == "pass", s["spec_decode"]
        assert s["spec_decode"]["mine"] == s["spec_decode"]["plain"]
        assert s["spec_decode"]["verify_forwards"] >= 1

    def test_gate_with_ref_token_parity(self, tmp_path, ckpt_dir):
        report, code = _run_gate(
            tmp_path, ckpt_dir, ["--ref", "--max-tokens", "5"]
        )
        assert code == 0, report
        s = report["steps"]
        assert s["vqa_greedy"]["status"] == "pass", s["vqa_greedy"]
        assert s["vqa_greedy"]["mine"] == s["vqa_greedy"]["reference"]
        assert s["vae_pixel"]["status"] == "pass", s["vae_pixel"]
        assert s["vae_pixel"]["psnr_db"] > 35.0

    def test_gate_int8_single_chip_load(self, tmp_path, ckpt_dir):
        """--int8 must quantize DURING host staging (loader quantize_bits),
        never materialising the bf16 tree on device — the single-chip path
        for full-size checkpoints. Greedy divergence vs the bf16 reference
        is a warn, not a gate failure."""
        report, code = _run_gate(
            tmp_path, ckpt_dir, ["--int8", "--ref", "--max-tokens", "4"]
        )
        assert code == 0, report
        s = report["steps"]
        assert s["load"]["status"] == "pass"
        assert s["load"]["int8"] is True
        assert s["vqa_greedy"]["status"] in ("pass", "warn"), s["vqa_greedy"]
        assert s["spec_decode"]["status"] == "pass", s["spec_decode"]
        assert report["summary"]["fail"] == 0

    def test_gate_golden_roundtrip(self, tmp_path, ckpt_dir):
        """Second run against the first run's recorded stats must pass."""
        report, _ = _run_gate(tmp_path, ckpt_dir, ["--max-tokens", "4"])
        golden = tmp_path / "golden.json"
        golden.write_text(json.dumps(report["steps"]["t2i_golden"]["stats"]))
        report2, code = _run_gate(
            tmp_path, ckpt_dir,
            ["--max-tokens", "4", "--golden", str(golden)],
        )
        assert code == 0
        assert report2["steps"]["t2i_golden"]["status"] == "pass"
