"""Re-measure the torch-CPU reference baseline for bench.py.

The reference (juniarto-samsudin/shapley-vit) evaluates one full validation
pass per distinct coalition with an HF ViT-B/16 under torch
(shapleyserver/federated_learning/utils.py:864-926). This measures that
forward's CPU throughput on the current machine and rewrites
bench_baseline.json. Run: python tools/measure_cpu_baseline.py
"""

import json
import os
import time

VAL_SET = 512


def main():
    import torch
    from transformers import ViTConfig, ViTForImageClassification

    torch.set_num_threads(os.cpu_count() or 1)
    model = ViTForImageClassification(ViTConfig(num_labels=4)).eval()
    x = torch.randn(32, 3, 224, 224)
    with torch.no_grad():
        model(x)  # warm-up
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            model(x)
        dt = (time.time() - t0) / iters
    imgs_per_sec = 32 / dt
    out = {
        "description": (
            "Reference (torch CPU) baseline for the headline metric, measured "
            "fresh on this machine with tools/measure_cpu_baseline.py. The "
            "reference evaluates coalitions serially: one full validation pass "
            f"({VAL_SET} imgs here) per distinct coalition on ViT-B/16 "
            "(shapleyserver/start.py:84, game2.py:106-110)."
        ),
        "cpu_imgs_per_sec_vitb16": round(imgs_per_sec, 3),
        "val_set_size": VAL_SET,
        "cpu_coalition_evals_per_sec": round(imgs_per_sec / VAL_SET, 6),
        "measured": f"torch {torch.__version__}, {torch.get_num_threads()} threads, batch 32",
    }
    path = os.path.join(os.path.dirname(__file__), "..", "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
