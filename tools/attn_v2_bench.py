"""In-vit benchmark of the packed-layout fused attention kernel (TPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ["SVT_ENABLE_PALLAS"] = "1"
import numpy as np, jax
import shapley_vit_tpu.models.vit as V

base = None
x = None
for impl, gelu in [("xla", "tanh"), ("pallas2", "tanh")]:
    spec = V.make_spec("base", num_classes=4, dtype="bfloat16", attention_impl=impl, gelu=gelu)
    if base is None:
        base = V.init_vit(jax.random.key(0), spec)
        x = jax.device_put(np.random.default_rng(0).normal(size=(128,224,224,3)).astype(np.float32))
    f = jax.jit(lambda b, xx: V.vit_forward(b, None, xx, spec))
    t0=time.time(); out = f(base, x); ref = np.asarray(out); print(f"{impl} compile: {time.time()-t0:.0f}s", flush=True)
    t0=time.time()
    for _ in range(10): out = f(base, x)
    _ = np.asarray(out[:1]); dt=(time.time()-t0)/10
    if impl == "xla": ref_logits = ref
    drift = np.abs(np.asarray(out) - ref_logits).max()
    print(f"{impl}+{gelu}: {dt*1000:.1f} ms ({128/dt:.0f} img/s), drift {drift:.4f}", flush=True)
