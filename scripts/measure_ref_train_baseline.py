"""Measure the reference engine's training-step throughput (torch CPU).

Executes /root/reference trajnetbaselines.lstm end-to-end for one optimizer
step per batch (forward with teacher forcing + PredictionLoss + backward +
Adam), batched-8 D-LSTM at A=8 — the same configuration and measurement
style as the rollout baseline in bench.py (114.85 scenes/sec).  The result
seeds REFERENCE_TRAIN_SCENES_PER_SEC in bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from tests.reference_harness import load_reference


def main():
    import torch

    ref = load_reference()
    torch.manual_seed(0)
    pool = ref.lstm.gridbased_pooling.GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256,
        embedding_arch="one_layer",
    )
    model = ref.lstm.lstm.LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    criterion = ref.lstm.loss.PredictionLoss(keep_batch_dim=False)
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)

    s, a, t = 8, 8, 21
    rng = np.random.default_rng(0)
    xy = torch.FloatTensor(rng.normal(size=(t, s * a, 2)).cumsum(axis=0) * 0.3)
    batch_split = torch.LongTensor(np.arange(0, s * a + 1, a))
    goals = torch.zeros(s * a, 2)

    def step():
        optimizer.zero_grad()
        rel, _ = model(xy[:9], goals, batch_split, xy[9:20].clone())
        targets = xy[9:21] - xy[8:20]  # loss selects primaries via batch_split
        loss = criterion(rel[-12:], targets, batch_split) * s
        loss.backward()
        optimizer.step()

    step()  # warm
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    print(f"reference train throughput: {s * iters / dt:.2f} scenes/sec "
          f"({dt / iters * 1000:.0f} ms/step, batch={s}, A={a}, D-LSTM)")


if __name__ == "__main__":
    main()
