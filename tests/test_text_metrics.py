"""Text-metric unit tests against hand-computed reference values (the
generation-task columns of /root/reference/README.md:270)."""

import math

import numpy as np

from unimedvl_tpu.eval.text_metrics import (
    bleu, bleu3, meteor, rouge_l, report_metrics, tokenize,
)

PRED = "the cat sat on mat"
REF = "the cat sat on the mat"


class TestBleu:
    def test_identity_is_one(self):
        assert bleu3([REF], [REF]) == 1.0

    def test_hand_computed(self):
        # p1 = 5/5, p2 = 3/4, p3 = 2/3, BP = exp(1 - 6/5)
        want = math.exp(-0.2) * (1.0 * 0.75 * (2 / 3)) ** (1 / 3)
        np.testing.assert_allclose(bleu3([PRED], [REF]), want, rtol=1e-12)

    def test_no_trigram_overlap_is_zero(self):
        assert bleu3(["a b c"], ["x y z"]) == 0.0
        assert bleu3(["a x b y c z"], ["a b c q r s"]) == 0.0  # no common 3-gram

    def test_corpus_level_pools_counts(self):
        # corpus BLEU pools clipped counts, not sentence scores
        preds = [PRED, "totally different words"]
        refs = [REF, "no overlap here at all"]
        assert 0.0 <= bleu3(preds, refs) < bleu3([PRED], [REF])

    def test_empty_prediction(self):
        assert bleu3([""], [REF]) == 0.0


class TestRougeL:
    def test_identity_is_one(self):
        np.testing.assert_allclose(rouge_l([REF], [REF]), 1.0, rtol=1e-12)

    def test_hand_computed(self):
        # LCS = 5, P = 1, R = 5/6, beta = 1.2
        p, r, b2 = 1.0, 5 / 6, 1.44
        want = (1 + b2) * p * r / (r + b2 * p)
        np.testing.assert_allclose(rouge_l([PRED], [REF]), want, rtol=1e-12)

    def test_disjoint_is_zero(self):
        assert rouge_l(["a b"], ["c d"]) == 0.0

    def test_subsequence_not_substring(self):
        # LCS("a x b", "a b") = 2 even though "a b" is not contiguous in pred
        p, r, b2 = 2 / 3, 1.0, 1.44
        want = (1 + b2) * p * r / (r + b2 * p)
        np.testing.assert_allclose(rouge_l(["a x b"], ["a b"]), want, rtol=1e-12)


class TestMeteor:
    def test_hand_computed(self):
        # m=5, P=1, R=5/6, chunks=2 (the..on contiguous; mat jumps)
        p, r = 1.0, 5 / 6
        f_mean = p * r / (0.9 * p + 0.1 * r)
        want = (1 - 0.5 * (2 / 5) ** 3) * f_mean
        np.testing.assert_allclose(meteor([PRED], [REF]), want, rtol=1e-12)

    def test_identity_single_chunk(self):
        # identical strings: one chunk, frag = 1/6 -> tiny penalty (standard
        # METEOR of identity is slightly below 1)
        want = 1.0 - 0.5 * (1 / 6) ** 3
        np.testing.assert_allclose(meteor([REF], [REF]), want, rtol=1e-12)

    def test_disjoint_is_zero(self):
        assert meteor(["a b"], ["c d"]) == 0.0


class TestReportMetrics:
    def test_keys_and_ranges(self):
        out = report_metrics([PRED, REF], [REF, REF])
        assert set(out) == {"bleu3", "meteor", "rouge_l"}
        for v in out.values():
            assert 0.0 <= v <= 1.0

    def test_tokenize_casefold_and_punct(self):
        assert tokenize("The CAT, sat!") == ["the", "cat", "sat"]
        # metrics are punctuation/case insensitive
        assert rouge_l(["The cat."], ["the cat"]) == 1.0

    def test_pluggable_into_runner_signature(self):
        # run_vqa_eval calls metric(predictions, answers) — dict return works
        from unimedvl_tpu.eval import report_metrics as rm
        out = rm(["a b c"], ["a b c"])
        assert isinstance(out, dict)
