"""Forward-pass optimization experiments (run on TPU, background)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import shapley_vit_tpu.models.vit as V

spec = V.make_spec("base", num_classes=4, dtype="bfloat16")
base = V.init_vit(jax.random.key(0), spec)
x = jax.device_put(np.random.default_rng(0).normal(size=(128, 224, 224, 3)).astype(np.float32))

def timeit(f):
    out = f(base, x); _ = np.asarray(out[:1])
    t0 = time.time()
    for _ in range(10):
        out = f(base, x)
    _ = np.asarray(out[:1])
    return (time.time() - t0) / 10 * 1000

print(f"A baseline: {timeit(jax.jit(lambda b, x: V.vit_forward(b, None, x, spec))):.1f} ms", flush=True)

# B: bf16 softmax (skip the f32 upcast on attention probs)
orig_attention = V._attention
def attn_bf16_softmax(xx, attn_p, lora_p, sp):
    B, N, D = xx.shape
    h, hd = sp.heads, sp.head_dim
    def proj(p, name):
        y = xx @ p["kernel"].astype(xx.dtype) + p["bias"].astype(xx.dtype)
        return y
    q = proj(attn_p["q"], "q").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    k = proj(attn_p["k"], "k").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    v = proj(attn_p["v"], "v").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.asarray(jnp.sqrt(jnp.float32(hd)), xx.dtype)
    probs = jax.nn.softmax(logits, axis=-1)  # stays bf16
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
    return ctx @ attn_p["out"]["kernel"].astype(xx.dtype) + attn_p["out"]["bias"].astype(xx.dtype)
V._attention = attn_bf16_softmax
print(f"B bf16-softmax: {timeit(jax.jit(lambda b, x: V.vit_forward(b, None, x, spec))):.1f} ms", flush=True)
V._attention = orig_attention

# C: unrolled scan
import jax.lax as lax
orig_scan = lax.scan
def unrolled_scan(f, init, xs, **kw):
    kw["unroll"] = True
    return orig_scan(f, init, xs, **kw)
V.jax.lax = jax.lax  # no-op
# patch inside vit_forward via jax.lax.scan monkeypatch
jax.lax.scan_orig = orig_scan
import types
def fwd_unrolled(b, xx):
    try:
        lax.scan = unrolled_scan
        return V.vit_forward(b, None, xx, spec)
    finally:
        lax.scan = orig_scan
# need the patch visible where vit_forward refers jax.lax.scan
V.jax.lax.scan = unrolled_scan
print(f"C unrolled-scan: {timeit(jax.jit(lambda b, x: V.vit_forward(b, None, x, spec))):.1f} ms", flush=True)
V.jax.lax.scan = orig_scan

# D: bf16 softmax + unrolled
V._attention = attn_bf16_softmax
V.jax.lax.scan = unrolled_scan
print(f"D both: {timeit(jax.jit(lambda b, x: V.vit_forward(b, None, x, spec))):.1f} ms", flush=True)
V._attention = orig_attention
V.jax.lax.scan = orig_scan

# E: tanh-approx GELU (bf16-friendly)
orig_block = V._block
def block_tanh_gelu(xx, blk_p, lora_p, sp):
    eps = sp.layernorm_eps
    y = V._layer_norm(xx, blk_p["ln1"]["scale"], blk_p["ln1"]["bias"], eps)
    xx = xx + V._attention(y, blk_p["attn"], lora_p, sp)
    y = V._layer_norm(xx, blk_p["ln2"]["scale"], blk_p["ln2"]["bias"], eps)
    y = y @ blk_p["mlp"]["fc1"]["kernel"].astype(xx.dtype) + blk_p["mlp"]["fc1"]["bias"].astype(xx.dtype)
    y = jax.nn.gelu(y, approximate=True)  # bf16 tanh approx
    y = y @ blk_p["mlp"]["fc2"]["kernel"].astype(xx.dtype) + blk_p["mlp"]["fc2"]["bias"].astype(xx.dtype)
    return xx + y
V._block = block_tanh_gelu
print(f"E tanh-gelu-bf16: {timeit(jax.jit(lambda b, x: V.vit_forward(b, None, x, spec))):.1f} ms", flush=True)
V._block = orig_block
