#!/usr/bin/env python
"""Measure the PyTorch reference's CPU training throughput (the missing
baseline denominator; reference publishes no numbers — see BASELINE.md).

Imports the reference implementation from /root/reference at runtime (no
code is copied) and times fwd+bwd+opt steps of model_ad on synthetic
batch-8 volumes at the ADNI shape (1, 91, 109, 91). Writes
BASELINE_MEASURED.json at the repo root.
"""

import json
import os
import sys
import time

import torch

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")


def main(batch=8, shape=(91, 109, 91), iters=3, warmup=1):
    sys.path.insert(0, REFERENCE)
    from models.mymodel import model_ad  # reference import, not a copy

    torch.manual_seed(0)
    model = model_ad(dim=128, depth=3, heads=4, dim_head=32, mlp_dim=512,
                     dropout=0)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = torch.nn.CrossEntropyLoss()
    mri = torch.randn(batch, 1, *shape)
    pet = torch.randn(batch, 1, *shape)
    label = torch.randint(0, 2, (batch,))

    def step():
        opt.zero_grad()
        logits, d_mri, d_pet = model(mri, pet)
        ce = crit(logits, label)
        ad = (crit(d_mri, torch.ones(batch, dtype=torch.long))
              + crit(d_pet, torch.zeros(batch, dtype=torch.long))) / 2
        (ce + ad).backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    vols_per_sec = batch / dt
    result = {
        "torch_cpu_model_ad_batch8": {
            "sec_per_step": dt,
            "volumes_per_sec": vols_per_sec,
            "batch": batch,
            "shape": list(shape),
            "threads": torch.get_num_threads(),
        }
    }
    print(json.dumps(result, indent=2))
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
