"""Pallas kernel correctness in interpreter mode (runs on the CPU mesh; the
compiled-TPU path is exercised by bench tooling when SVT_ENABLE_PALLAS=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.ops import attention as att


@pytest.mark.parametrize("N", [197, 128, 64])
def test_fused_attention_interpret_matches_xla(rng, N):
    B, H, D = 2, 3, 64
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    out = att._fused_attention_fwd_impl(q, k, v, interpret=True)
    ref = att._xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_padding_mask_correct(rng):
    """Padded key positions must contribute nothing: compare N=100 (padded to
    128 inside the kernel) against the exact XLA result."""
    B, H, N, D = 1, 2, 100, 32
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    out = att._fused_attention_fwd_impl(q, k, v, interpret=True)
    ref = att._xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_gradients_flow(rng):
    B, H, N, D = 1, 2, 17, 8
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)

    def f(q):
        return jnp.sum(att.fused_attention(q, q, q) ** 2)

    g = jax.grad(f)(q)
    assert g.shape == q.shape and float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("N", [197, 64])
def test_fused_attention_packed_matches_xla(rng, N):
    B, H, D = 2, 4, 16
    q = jnp.asarray(rng.normal(size=(B, N, H * D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H * D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H * D)), jnp.float32)
    got = att.fused_attention_packed(q, k, v, heads=H, interpret=True)
    # reference: unpack -> per-head attention -> repack
    qh = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    ref = att._xla_attention(qh, kh, vh).transpose(0, 2, 1, 3).reshape(B, N, H * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_vit_pallas2_flag_cpu_fallback(rng):
    from shapley_vit_tpu.models import vit as jvit

    spec_x = jvit.make_spec("micro")
    spec_p = jvit.make_spec("micro").replace(attention_impl="pallas2")
    base = jvit.init_vit(jax.random.key(0), spec_x)
    x = np.asarray(rng.normal(size=(2, 16, 16, 3)), np.float32)
    np.testing.assert_allclose(
        np.asarray(jvit.vit_forward(base, None, x, spec_x)),
        np.asarray(jvit.vit_forward(base, None, x, spec_p)),
        atol=1e-5,
    )


def test_fused_mlp_block_matches_reference_math(rng):
    from shapley_vit_tpu.ops.mlp_block import fused_mlp_block

    M, D, H = 100, 64, 256  # unaligned M exercises the row padding
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    ls = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)

    got = fused_mlp_block(x, ls, lb, w1, b1, w2, b2, eps=1e-12,
                          block_rows=64, interpret=True)

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-12) * ls + lb
    ref = x + (jax.nn.gelu(y @ w1 + b1, approximate=False) @ w2 + b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_patch_embed_kernel_matches_patchify(rng):
    from shapley_vit_tpu.models.vit import _patchify
    from shapley_vit_tpu.ops.patch_embed import patch_embed

    B, Hh, Ww, C, p, D = 2, 16, 16, 3, 4, 32
    images = jnp.asarray(rng.normal(size=(B, Hh, Ww, C)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(p * p * C, D)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    got = patch_embed(images, kernel, bias, p, interpret=True)
    ref = _patchify(images, p) @ kernel + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_vit_pallas_spec_flag_cpu_fallback(rng):
    """attention_impl='pallas' on CPU falls back to XLA math — logits must be
    identical to the default path."""
    from shapley_vit_tpu.models import vit as jvit

    spec_x = jvit.make_spec("micro")
    spec_p = jvit.make_spec("micro").replace(attention_impl="pallas")
    base = jvit.init_vit(jax.random.key(0), spec_x)
    x = np.asarray(rng.normal(size=(2, 16, 16, 3)), np.float32)
    out_x = np.asarray(jvit.vit_forward(base, None, x, spec_x))
    out_p = np.asarray(jvit.vit_forward(base, None, x, spec_p))
    np.testing.assert_allclose(out_x, out_p, atol=1e-5)


def test_vit_mlp_patch_pallas_wiring_interpret(rng, monkeypatch):
    """mlp_impl/patch_impl='pallas' run IN the ViT forward (interpreter via
    SVT_PALLAS_INTERPRET=1) and match the XLA path — the wiring contract the
    on-TPU ledger run (BENCH_NOTES round 3) relies on."""
    from shapley_vit_tpu.models import vit as jvit

    spec_x = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec_x)
    lora = jvit.init_lora(jax.random.key(1), spec_x, classifier_from=base)
    x = np.asarray(rng.normal(size=(2, 16, 16, 3)), np.float32)
    want = np.asarray(jvit.vit_forward(base, lora, x, spec_x))

    monkeypatch.setenv("SVT_PALLAS_INTERPRET", "1")
    for impl in (
        spec_x.replace(mlp_impl="pallas"),
        spec_x.replace(patch_impl="pallas"),
        spec_x.replace(mlp_impl="pallas", patch_impl="pallas"),
    ):
        got = np.asarray(jvit.vit_forward(base, lora, x, impl))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # without the interpret escape, CPU falls back to XLA silently
    monkeypatch.delenv("SVT_PALLAS_INTERPRET")
    got = np.asarray(
        jvit.vit_forward(base, lora, x, spec_x.replace(mlp_impl="pallas"))
    )
    np.testing.assert_allclose(got, want, atol=0)


def test_vit_mlp_pallas_tanh_gelu_interpret(rng, monkeypatch):
    """The fused MLP kernel honors the fast-eval tanh GELU flavor."""
    from shapley_vit_tpu.models import vit as jvit

    spec_t = jvit.make_spec("micro", gelu="tanh")
    base = jvit.init_vit(jax.random.key(0), spec_t)
    x = np.asarray(rng.normal(size=(2, 16, 16, 3)), np.float32)
    want = np.asarray(jvit.vit_forward(base, None, x, spec_t))
    monkeypatch.setenv("SVT_PALLAS_INTERPRET", "1")
    got = np.asarray(
        jvit.vit_forward(base, None, x, spec_t.replace(mlp_impl="pallas"))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
