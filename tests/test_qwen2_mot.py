"""Qwen2 MoT decoder parity tests against an independent torch oracle that
implements the reference semantics (qwen2_navit.py PackedAttentionMoT /
Qwen2MoTDecoderLayer forward_inference) directly from the formulas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from unimedvl_tpu.config import LLMConfig
from unimedvl_tpu.models import qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import KVCache, ForwardSpec

CFG = LLMConfig(
    vocab_size=100,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    rope_theta=10000.0,
    qk_norm=True,
    layer_module="Qwen2MoTDecoderLayer",
)


def t(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def t_rms(x, w, eps=1e-6):
    var = x.pow(2).mean(-1, keepdim=True)
    return w * (x * torch.rsqrt(var + eps))


def t_lin(x, p):
    y = x @ t(p["kernel"])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def t_rope(x, pos, theta, D):
    inv = 1.0 / (theta ** (torch.arange(0, D, 2).float() / D))
    freqs = pos.float()[:, None] * inv[None]
    emb = torch.cat([freqs, freqs], dim=-1)  # [T, D]
    cos, sin = emb.cos()[:, None, :], emb.sin()[:, None, :]

    def rot(v):
        h = v.shape[-1] // 2
        return torch.cat([-v[..., h:], v[..., :h]], dim=-1)

    return lambda v: v * cos + rot(v) * sin


class TorchOracle:
    """Single-stream reference-semantics forward (fp32)."""

    def __init__(self, params, cfg: LLMConfig):
        self.p = jax.tree.map(lambda a: np.asarray(a), params)
        self.cfg = cfg

    def forward(self, x, positions, past_k, past_v, mode="und", is_causal=True,
                update_cache=True):
        cfg = self.cfg
        T, C = x.shape
        H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        G = H // Hk
        x = t(x)
        pos = torch.from_numpy(np.asarray(positions))
        rope = t_rope(x, pos, cfg.rope_theta, D)

        def mot_rows(v, und_fn, gen_fn):
            if mode == "und":
                return und_fn(v)
            out = gen_fn(v)
            out[0] = und_fn(v[0:1])[0]
            out[-1] = und_fn(v[-1:])[0]
            return out

        new_k, new_v = [], []
        for li in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a: a[li], self.p["layers"])
            res = x
            h = mot_rows(
                x,
                lambda v: t_rms(v, t(lp["input_layernorm"]["scale"])),
                lambda v: t_rms(v, t(lp["input_layernorm_moe_gen"]["scale"])),
            )
            ap = lp["attn"]
            q = mot_rows(h, lambda v: t_lin(v, ap["q"]), lambda v: t_lin(v, ap["q_gen"]))
            k = mot_rows(h, lambda v: t_lin(v, ap["k"]), lambda v: t_lin(v, ap["k_gen"]))
            v_ = mot_rows(h, lambda v: t_lin(v, ap["v"]), lambda v: t_lin(v, ap["v_gen"]))
            q = q.view(T, H, D)
            k = k.view(T, Hk, D)
            v_ = v_.view(T, Hk, D)
            if cfg.qk_norm:
                qn = mot_rows(
                    q,
                    lambda u: t_rms(u, t(ap["q_norm"]["scale"])),
                    lambda u: t_rms(u, t(ap["q_norm_gen"]["scale"])),
                )
                kn = mot_rows(
                    k,
                    lambda u: t_rms(u, t(ap["k_norm"]["scale"])),
                    lambda u: t_rms(u, t(ap["k_norm_gen"]["scale"])),
                )
                q, k = qn, kn
            q, k = rope(q), rope(k)

            pk, pv = past_k[li], past_v[li]  # [Tp, Hk, D] torch
            k_all = torch.cat([pk, k], dim=0)
            v_all = torch.cat([pv, v_], dim=0)
            Tk = k_all.shape[0]
            Tp = pk.shape[0]
            # suffix mask
            mask = torch.zeros(T, Tk, dtype=torch.bool)
            mask[:, :Tp] = True
            for qi in range(T):
                if is_causal:
                    mask[qi, Tp : Tp + qi + 1] = True
                else:
                    mask[qi, Tp:] = True
            # GQA attention
            kr = k_all[:, :, None, :].repeat(1, 1, G, 1).reshape(Tk, H, D)
            vr = v_all[:, :, None, :].repeat(1, 1, G, 1).reshape(Tk, H, D)
            logits = torch.einsum("qhd,khd->hqk", q, kr) / np.sqrt(D)
            logits = logits.masked_fill(~mask[None], float("-inf"))
            probs = torch.softmax(logits, dim=-1)
            o = torch.einsum("hqk,khd->qhd", probs, vr).reshape(T, H * D)
            o = mot_rows(o, lambda u: t_lin(u, ap["o"]), lambda u: t_lin(u, ap["o_gen"]))
            x = res + o

            res = x
            def mlp(u, mp, nscale):
                un = t_rms(u, t(nscale))
                return t_lin(
                    torch.nn.functional.silu(t_lin(un, mp["gate"])) * t_lin(un, mp["up"]),
                    mp["down"],
                )
            h = mot_rows(
                x,
                lambda u: mlp(u, lp["mlp"], lp["post_attention_layernorm"]["scale"]),
                lambda u: mlp(u, lp["mlp_moe_gen"], lp["post_attention_layernorm_moe_gen"]["scale"]),
            )
            x = res + h
            if update_cache:
                new_k.append(k_all)
                new_v.append(v_all)
            else:
                new_k.append(pk)
                new_v.append(pv)

        x = mot_rows(
            x,
            lambda u: t_rms(u, t(self.p["norm"]["scale"])),
            lambda u: t_rms(u, t(self.p["norm_moe_gen"]["scale"])),
        )
        return x.numpy(), new_k, new_v


def make_cache(capacity, streams=1):
    return KVCache.create(
        CFG.num_hidden_layers, streams, capacity, CFG.num_key_value_heads,
        CFG.head_dim, dtype=jnp.float32,
    )


class TestMoTParity:
    def setup_method(self):
        self.params = mot.init_params(jax.random.PRNGKey(0), CFG)
        # break the all-ones norm scales so norms are actually exercised
        rng = np.random.default_rng(7)

        def jitter(p):
            return jax.tree.map(
                lambda a: a * jnp.asarray(1 + 0.1 * rng.standard_normal(a.shape), a.dtype)
                if a.ndim >= 1 else a,
                p,
            )

        self.params = jitter(self.params)
        self.oracle = TorchOracle(self.params, CFG)
        self.rng = np.random.default_rng(3)

    def test_und_prefill_then_decode(self):
        T, C = 5, CFG.hidden_size
        x = self.rng.standard_normal((T, C)).astype(np.float32)
        pos = np.arange(T)

        empty_k = [torch.zeros(0, CFG.num_key_value_heads, CFG.head_dim) for _ in range(2)]
        empty_v = [torch.zeros(0, CFG.num_key_value_heads, CFG.head_dim) for _ in range(2)]
        want, ok, ov = self.oracle.forward(x, pos, empty_k, empty_v, "und", True)

        cache = make_cache(capacity=16)
        got, cache2 = mot.forward(
            self.params, CFG, jnp.asarray(x)[None], jnp.asarray(pos)[None],
            cache, ForwardSpec("und", True, True),
        )
        np.testing.assert_allclose(np.asarray(got[0]), want, rtol=2e-4, atol=2e-5)
        assert int(cache2.lens[0]) == T
        for li in range(2):
            # head-major cache [L, S, Hk, M, D] -> oracle layout [T, Hk, D]
            got_k = np.swapaxes(np.asarray(cache2.k[li, 0, :, :T]), 0, 1)
            np.testing.assert_allclose(
                got_k, ok[li].numpy(), rtol=2e-4, atol=2e-5
            )

        # decode one token
        x1 = self.rng.standard_normal((1, C)).astype(np.float32)
        want1, _, _ = self.oracle.forward(x1, np.array([T]), ok, ov, "und", True)
        got1, cache3 = mot.forward(
            self.params, CFG, jnp.asarray(x1)[None], jnp.asarray([[T]]),
            cache2, ForwardSpec("und", True, True),
        )
        np.testing.assert_allclose(np.asarray(got1[0]), want1, rtol=2e-4, atol=2e-5)
        assert int(cache3.lens[0]) == T + 1

    def test_gen_block_no_update(self):
        # context prefill first
        T, C = 4, CFG.hidden_size
        ctx = self.rng.standard_normal((T, C)).astype(np.float32)
        pos = np.arange(T)
        empty = [torch.zeros(0, CFG.num_key_value_heads, CFG.head_dim) for _ in range(2)]
        _, ok, ov = self.oracle.forward(ctx, pos, empty, list(empty), "und", True)

        cache = make_cache(capacity=16)
        _, cache = mot.forward(
            self.params, CFG, jnp.asarray(ctx)[None], jnp.asarray(pos)[None],
            cache, ForwardSpec("und", True, True),
        )

        # gen block: [start, 4 vae tokens, end], shared rope position, full attn
        Tg = 6
        xg = self.rng.standard_normal((Tg, C)).astype(np.float32)
        gpos = np.full(Tg, T)
        want, _, _ = self.oracle.forward(
            xg, gpos, ok, ov, "gen", False, update_cache=False
        )
        got, cache_after = mot.forward(
            self.params, CFG, jnp.asarray(xg)[None], jnp.asarray(gpos)[None],
            cache, ForwardSpec("gen", False, False),
        )
        np.testing.assert_allclose(np.asarray(got[0]), want, rtol=2e-4, atol=2e-5)
        assert int(cache_after.lens[0]) == T  # unchanged

    def test_gen_block_with_update(self):
        T, C = 3, CFG.hidden_size
        ctx = self.rng.standard_normal((T, C)).astype(np.float32)
        pos = np.arange(T)
        empty = [torch.zeros(0, CFG.num_key_value_heads, CFG.head_dim) for _ in range(2)]
        _, ok, ov = self.oracle.forward(ctx, pos, empty, list(empty), "und", True)
        cache = make_cache(capacity=16)
        _, cache = mot.forward(
            self.params, CFG, jnp.asarray(ctx)[None], jnp.asarray(pos)[None],
            cache, ForwardSpec("und", True, True),
        )
        Tg = 5
        xg = self.rng.standard_normal((Tg, C)).astype(np.float32)
        gpos = np.full(Tg, T)
        want, wk, wv = self.oracle.forward(xg, gpos, ok, ov, "gen", False, True)
        got, cache2 = mot.forward(
            self.params, CFG, jnp.asarray(xg)[None], jnp.asarray(gpos)[None],
            cache, ForwardSpec("gen", False, True),
        )
        np.testing.assert_allclose(np.asarray(got[0]), want, rtol=2e-4, atol=2e-5)
        assert int(cache2.lens[0]) == T + Tg
        got_k = np.swapaxes(np.asarray(cache2.k[1, 0, :, : T + Tg]), 0, 1)
        np.testing.assert_allclose(
            got_k, wk[1].numpy(), rtol=2e-4, atol=2e-5
        )

    def test_moe_variant_gen_mode(self):
        """Qwen2MoEDecoderLayer: shared dense attention + single norms, dual
        MLP (qwen2_navit.py:905-1004). Gen-mode text rows use mlp, vae rows
        mlp_moe_gen."""
        import dataclasses

        cfg = dataclasses.replace(CFG, layer_module="Qwen2MoEDecoderLayer")
        params = mot.init_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(11)

        # structure: no dual norms, but dual MLPs + dual final norm
        lp = jax.tree.map(lambda a: a[0], params["layers"])
        assert "input_layernorm_moe_gen" not in lp
        assert "mlp_moe_gen" in lp
        assert "q_gen" not in lp["attn"]
        assert "norm_moe_gen" in params

        Tg, C = 5, cfg.hidden_size
        xg = rng.standard_normal((Tg, C)).astype(np.float32)
        cache = KVCache.create(cfg.num_hidden_layers, 1, 16,
                               cfg.num_key_value_heads, cfg.head_dim, jnp.float32)
        got, _ = mot.forward(
            params, cfg, jnp.asarray(xg)[None], jnp.full((1, Tg), 0),
            cache, ForwardSpec("gen", False, False),
        )

        # torch oracle for the MoE layer semantics
        import torch

        p = jax.tree.map(np.asarray, params)
        x = t(xg)
        pos = torch.zeros(Tg, dtype=torch.long)
        H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        G = H // Hk
        rope = t_rope(x, pos, cfg.rope_theta, D)
        for li in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a: a[li], p["layers"])
            res = x
            h = t_rms(x, t(lp["input_layernorm"]["scale"]))
            q = t_lin(h, lp["attn"]["q"]).view(Tg, H, D)
            k = t_lin(h, lp["attn"]["k"]).view(Tg, Hk, D)
            v = t_lin(h, lp["attn"]["v"]).view(Tg, Hk, D)
            q = t_rms(q, t(lp["attn"]["q_norm"]["scale"]))
            k = t_rms(k, t(lp["attn"]["k_norm"]["scale"]))
            q, k = rope(q), rope(k)
            kr = k[:, :, None, :].repeat(1, 1, G, 1).reshape(Tg, H, D)
            vr = v[:, :, None, :].repeat(1, 1, G, 1).reshape(Tg, H, D)
            logits = torch.einsum("qhd,khd->hqk", q, kr) / np.sqrt(D)
            probs = torch.softmax(logits, dim=-1)
            o = torch.einsum("hqk,khd->qhd", probs, vr).reshape(Tg, H * D)
            x = res + t_lin(o, lp["attn"]["o"])
            res = x
            xn = t_rms(x, t(lp["post_attention_layernorm"]["scale"]))

            def mlp(u, mp):
                return t_lin(
                    torch.nn.functional.silu(t_lin(u, mp["gate"])) * t_lin(u, mp["up"]),
                    mp["down"],
                )

            out = mlp(xn, lp["mlp_moe_gen"])
            out[0] = mlp(xn[0:1], lp["mlp"])[0]
            out[-1] = mlp(xn[-1:], lp["mlp"])[0]
            x = res + out
        final = t_rms(x, t(p["norm_moe_gen"]["scale"]))
        final[0] = t_rms(x[0:1], t(p["norm"]["scale"]))[0]
        final[-1] = t_rms(x[-1:], t(p["norm"]["scale"]))[0]
        np.testing.assert_allclose(
            np.asarray(got[0]), final.numpy(), rtol=2e-4, atol=2e-5
        )

    def test_stream_padding_invariance(self):
        """Two streams with different lengths padded == each alone."""
        C = CFG.hidden_size
        t1, t2, T = 6, 4, 6
        x1 = self.rng.standard_normal((t1, C)).astype(np.float32)
        x2 = self.rng.standard_normal((t2, C)).astype(np.float32)

        batch = np.zeros((2, T, C), np.float32)
        batch[0, :t1] = x1
        batch[1, :t2] = x2
        positions = np.zeros((2, T), np.int64)
        positions[0, :t1] = np.arange(t1)
        positions[1, :t2] = np.arange(t2)
        valid = np.zeros((2, T), bool)
        valid[0, :t1] = True
        valid[1, :t2] = True

        cache = make_cache(capacity=16, streams=2)
        got, cache2 = mot.forward(
            self.params, CFG, jnp.asarray(batch), jnp.asarray(positions),
            cache, ForwardSpec("und", True, True), q_valid=jnp.asarray(valid),
        )
        assert cache2.lens.tolist() == [t1, t2]

        for xi, ti, si in [(x1, t1, 0), (x2, t2, 1)]:
            solo_cache = make_cache(capacity=16)
            solo, _ = mot.forward(
                self.params, CFG, jnp.asarray(xi)[None],
                jnp.asarray(np.arange(ti))[None], solo_cache,
                ForwardSpec("und", True, True),
            )
            np.testing.assert_allclose(
                np.asarray(got[si, :ti]), np.asarray(solo[0]), rtol=2e-4, atol=2e-5
            )


class TestDecodeKernelGate:
    def test_threshold_lazy_loads_from_sweep_record(self, tmp_path, monkeypatch):
        """use_decode_kernel reads the sweep's measured decode_kernel_min_sm
        record once; absent / never-won records disable the kernel."""
        import json

        from unimedvl_tpu.models import qwen2_mot as mot

        p = tmp_path / "KERNEL_THRESHOLD.json"
        p.write_text(json.dumps({"decode_kernel_min_sm": 9216}))
        assert mot._load_decode_kernel_min_sm(str(p)) == 9216
        p.write_text(json.dumps({"decode_sweep": []}))
        assert mot._load_decode_kernel_min_sm(str(p)) is None
        assert mot._load_decode_kernel_min_sm(str(tmp_path / "missing.json")) is None

    def test_gate_off_on_cpu_and_explicit_override(self, monkeypatch):
        from unimedvl_tpu.models import qwen2_mot as mot

        # CPU backend: always off regardless of threshold
        monkeypatch.setattr(mot, "_DECODE_KERNEL_MIN_SM", 0)
        assert not mot.use_decode_kernel(256, 384)
        # explicit None forces the jnp path (the sweep's --single uses this)
        monkeypatch.setattr(mot, "_DECODE_KERNEL_MIN_SM", None)
        assert not mot.use_decode_kernel(256, 384)
