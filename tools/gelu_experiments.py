"""GELU-variant timing + accuracy-impact check (run after fwd_experiments)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import shapley_vit_tpu.models.vit as V

base = None
x = None
for gelu in ("exact_f32", "exact", "tanh"):
    spec = V.make_spec("base", num_classes=4, dtype="bfloat16", gelu=gelu)
    if base is None:
        base = V.init_vit(jax.random.key(0), spec)
        x = jax.device_put(np.random.default_rng(0).normal(size=(128,224,224,3)).astype(np.float32))
    f = jax.jit(lambda b, xx: V.vit_forward(b, None, xx, spec))
    out = f(base, x); ref = np.asarray(out)
    t0=time.time()
    for _ in range(10): out = f(base, x)
    _ = np.asarray(out[:1]); dt=(time.time()-t0)/10
    # logits drift + argmax agreement vs exact_f32
    if gelu == "exact_f32":
        ref_logits = ref
    drift = np.abs(np.asarray(out) - ref_logits).max()
    agree = (np.asarray(out).argmax(1) == ref_logits.argmax(1)).mean()
    print(f"{gelu}: {dt*1000:.1f} ms ({128/dt:.0f} img/s), max logit drift {drift:.4f}, argmax agree {agree:.3f}", flush=True)
