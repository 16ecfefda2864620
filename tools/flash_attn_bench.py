"""Try jax's library TPU flash-attention inside the ViT (background, TPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
import shapley_vit_tpu.models.vit as V

spec = V.make_spec("base", num_classes=4, dtype="bfloat16", gelu="tanh")
base = V.init_vit(jax.random.key(0), spec)
x = jax.device_put(np.random.default_rng(0).normal(size=(128,224,224,3)).astype(np.float32))

# library flash attention expects [B, H, N, D]; pad N to block multiples itself?
orig_attention = V._attention
def attn_flash(xx, attn_p, lora_p, sp):
    B, N, D = xx.shape
    h, hd = sp.heads, sp.head_dim
    def proj(p, name):
        y = xx @ p["kernel"].astype(xx.dtype) + p["bias"].astype(xx.dtype)
        if lora_p is not None and name in lora_p:
            a = lora_p[name]["A"].astype(xx.dtype); b = lora_p[name]["B"].astype(xx.dtype)
            y = y + (xx @ a) @ b * jnp.asarray(sp.lora_alpha / sp.lora_r, xx.dtype)
        return y
    q = proj(attn_p["q"], "q").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    k = proj(attn_p["k"], "k").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    v = proj(attn_p["v"], "v").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    ctx = flash_attention(q, k, v, causal=False, sm_scale=1.0/ (hd ** 0.5))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
    return ctx @ attn_p["out"]["kernel"].astype(xx.dtype) + attn_p["out"]["bias"].astype(xx.dtype)

def timeit(f):
    out = f(base, x); r = np.asarray(out)
    t0=time.time()
    for _ in range(10): out = f(base, x)
    _ = np.asarray(out[:1]); return (time.time()-t0)/10*1000, r

ms, ref = timeit(jax.jit(lambda b, xx: V.vit_forward(b, None, xx, spec)))
print(f"xla: {ms:.1f} ms", flush=True)
V._attention = attn_flash
try:
    ms2, out = timeit(jax.jit(lambda b, xx: V.vit_forward(b, None, xx, spec)))
    print(f"flash: {ms2:.1f} ms, drift {np.abs(out-ref).max():.4f}", flush=True)
except Exception as e:
    print("flash FAILED:", type(e).__name__, str(e)[:300], flush=True)
V._attention = orig_attention
