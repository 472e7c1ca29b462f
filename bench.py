"""Benchmark: scenes/sec for the flagship D-LSTM 9-obs/12-pred rollout.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference PyTorch engine (directional grid pooling, hidden 128,
n=12, cell_side 0.6) rolls out 114.85 scenes/sec on this container's CPU in
its native batched-8 mode (measured via tests/reference_harness executing
/root/reference trajnetbaselines.lstm with 8-agent scenes; the single-scene
joblib-eval shape manages 37 scenes/sec).  vs_baseline = ours / 114.85.

Capture robustness: the TPU tunnel's known failure mode is an indefinite
recvfrom stall (CLAUDE.md), which would otherwise turn a dead relay into a
driver-level timeout with zero output.  The top-level entrypoint therefore
runs the measurement in a WATCHDOGGED SUBPROCESS with a hard per-attempt
deadline, persists every successful result to .bench_last_good.json, and —
if every attempt dies or stalls — reprints the last good result with
"stale": true added.  Either way stdout carries exactly ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_SCENES_PER_SEC = 114.85  # torch CPU, batch=8, A=8, D-LSTM rollout
# torch CPU, batch=8, A=8, D-LSTM forward+loss+backward+Adam
# (scripts/measure_ref_train_baseline.py on this container)
REFERENCE_TRAIN_SCENES_PER_SEC = 46.38

# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16, ~49 TFLOP/s f32
# (MXU passes), 819 GB/s HBM.
V5E_PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49e12}
V5E_HBM_BYTES_PER_SEC = 819e9

LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_last_good.json")
# Per-attempt deadlines (seconds).  First attempt is generous: the remote AOT
# compiler bypasses the on-disk compile cache, so a cold process pays two full
# compiles (rollout + training epoch runner) through the tunnel.  Retries are
# tighter: by then either the tunnel works or it doesn't.  Total worst case
# (600+240+120 + sleeps) stays safely under the driver's round timeout.
ATTEMPT_DEADLINES = (600, 240, 120)
# When the tunnel relay is down outright, a client stalls in recvfrom forever
# (measured: no fast-fail).  Probe the relay's TCP port first and shrink the
# deadlines so a fully-dead tunnel resolves to the stale line in <3 min.
DEAD_TUNNEL_DEADLINES = (90, 60)
TUNNEL_PROBE = os.environ.get("BENCH_TUNNEL_PROBE", "127.0.0.1:8082")


def _tunnel_port_open():
    """True if the axon tunnel relay's TCP port accepts connections."""
    import socket

    host, _, port = TUNNEL_PROBE.rpartition(":")
    try:
        with socket.create_connection((host, int(port)), timeout=3):
            return True
    except (OSError, ValueError):
        return False


def dlstm_cost_model(a, s, n=12, d=2, h=128, e=64, p=256, steps=20,
                     dtype_bytes=4):
    """Analytic flops/bytes for one D-LSTM rollout (per scene, all steps).

    Matmul flops per agent-step: input embedding (2 x e), grid-embedding MLP
    (n^2*d x p), LSTM gates ((e+p) x 4h + h x 4h), Gaussian head (h x 5);
    plus the pooling contraction (one-hot [G,A]x[A,d] for A>16, select chain
    otherwise — counted as A*G*d MACs either way).  Bytes per agent-step:
    carry read+write (2*2h), pooled grid, pool/embed activations, plus the
    parameter stream amortized over the S*A agents sharing each step.
    Deliberately a lower bound on fusion quality: XLA keeps most of these in
    VMEM, so 'bytes' is the un-fused HBM-traffic ceiling.
    """
    g = n * n
    grid_dim = g * d
    matmul_flops = 2 * (
        2 * e + grid_dim * p + (e + p) * 4 * h + h * 4 * h + h * 5
    )
    pool_flops = 2 * a * g * d + a * g  # contraction + winner reduce
    flops_scene = steps * a * (matmul_flops + pool_flops)

    params = 2 * e + grid_dim * p + (e + p) * 4 * h + h * 4 * h + h * 5
    act_bytes = dtype_bytes * (4 * h + grid_dim + p + e + 7)
    weight_bytes = params * dtype_bytes / max(s * a, 1)
    bytes_scene = steps * a * (act_bytes + weight_bytes)
    return flops_scene, bytes_scene


def dlstm_train_cost_model(a, batch, n=12, d=2, h=128, e=64, p=256,
                           steps=20, dtype_bytes=4):
    """Analytic flops/bytes for one TRAINED scene (fwd + bwd + Adam).

    Backward through a matmul costs 2x the forward matmul flops (dL/dx and
    dL/dW), so fwd+bwd ~= 3x forward matmul flops; the pooling contraction
    and winner-reduce backward is a gather (counted once more).  Optimizer
    HBM traffic per step: Adam reads params+m+v+grads and writes params+m+v
    (7 arrays), amortized over the `batch` scenes sharing each update.
    Activation traffic: the epoch scan keeps the rollout resident, but bwd
    re-reads each step's saved activations once (2x the fwd activation
    stream as the un-fused ceiling).
    """
    fwd_flops, fwd_bytes = dlstm_cost_model(
        a, s=batch, n=n, d=d, h=h, e=e, p=p, steps=steps,
        dtype_bytes=dtype_bytes)
    g = n * n
    grid_dim = g * d
    params = 2 * e + grid_dim * p + (e + p) * 4 * h + h * 4 * h + h * 5
    flops_scene = 3 * fwd_flops + 2 * steps * a * (a * g * d)
    adam_bytes = 7 * params * dtype_bytes / max(batch, 1)
    bytes_scene = 2 * fwd_bytes + adam_bytes
    return flops_scene, bytes_scene


def _smoke_mode():
    """BENCH_CPU=1 runs the identical code path at toy sizes on the CPU
    backend — a functional check for when the TPU tunnel is down, never a
    measurement."""
    return bool(os.environ.get("BENCH_CPU"))


def train_throughput():
    """Scenes/sec trained: the resident-epoch scan exactly as the trainers
    run it (batch=8 sequential SGD, directional pooling, rotation
    augmentation on device, f32)."""
    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling
    from trajnetplusplusbaselines_tpu.trainers.common import (
        make_bucket_epoch_runner,
        make_optimizer,
    )

    pool = GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
    )
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), model.init_params(jax.random.PRNGKey(0))
    )
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)

    obs, pred, seq, batch = 9, 12, 21, 8

    def loss_fn(params, xy, mask, goals, slot, scene):
        from trajnetplusplusbaselines_tpu.losses import prediction_loss

        rel, _, _ = model.forward(
            params, xy[:obs], mask[:obs], goals, slot,
            prediction_truth=xy[obs : seq - 1],
            prediction_truth_mask=mask[obs : seq - 1],
        )
        targets = xy[obs:seq, :, 0] - xy[obs - 1 : seq - 1, :, 0]
        return prediction_loss(rel[-pred:, :, 0], targets, scene) * batch

    def step_core(carry, xy, mask, goals, slot, scene, key):
        del key
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, xy, mask, goals, slot, scene)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss

    runner = make_bucket_epoch_runner(step_core, augment=True)

    n_scenes, a, t = (256, 8, 21) if _smoke_mode() else (4096, 8, 21)
    rng = np.random.default_rng(0)
    xs = jnp.asarray((rng.normal(size=(n_scenes, t, a, 2)).cumsum(axis=1) * 0.3
                      ).astype(np.float32))
    mask = jnp.ones((n_scenes, t, a), bool)
    goals = jnp.zeros((n_scenes, a, 2), jnp.float32)
    num_agents = jnp.full((n_scenes,), a, jnp.int32)
    idx = jnp.asarray(
        rng.permutation(n_scenes).reshape(n_scenes // batch, batch).astype(np.int32)
    )
    valid = jnp.ones((n_scenes // batch, batch), bool)

    def run(carry, key):
        carry, losses = runner(carry, xs, mask, goals, num_agents, idx, valid, key)
        float(jnp.sum(losses))  # host sync
        return carry

    carry = (params, opt_state)
    carry = run(carry, jax.random.PRNGKey(0))  # compile + warm
    iters = 1 if _smoke_mode() else 5
    t0 = time.perf_counter()
    for i in range(iters):
        carry = run(carry, jax.random.PRNGKey(i + 1))
    dt = time.perf_counter() - t0
    return n_scenes * iters / dt


def run_bench():
    """One full measurement pass; returns the result dict."""
    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    pool = GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
    )
    # bfloat16 inference: +46% throughput vs float32 at a mean final-position
    # deviation of 0.0035 m (max 0.06 m) against the f32 rollout — metric-
    # equivalent at ADE ~0.6 m scales
    dtype = jnp.bfloat16
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128).with_dtype(dtype)
    # unroll=6 won the round-3 sweep (349k/359k/361k/365k/305k scenes/s for
    # unroll 1/2/4/6/12): wider per-program fusion windows across rollout
    # steps; 12 regresses (program too large).  Eval paths keep unroll=1 —
    # the remote AOT compiler's VMEM budget is the binding constraint there.
    model.scan_unroll = 6
    params = jax.tree.map(
        lambda x: x.astype(dtype), model.init_params(jax.random.PRNGKey(0))
    )

    s, a, t = (1024, 8, 21) if _smoke_mode() else (131072, 8, 21)
    rng = np.random.default_rng(0)
    xy = (rng.normal(size=(t, s, a, 2)).cumsum(axis=0) * 0.3).astype(dtype)
    mask = np.ones((t, s, a), bool)
    goals = np.zeros((s, a, 2), dtype)
    slot = np.ones((s, a), bool)

    # Scan the rollout over 64 independent 2048-scene groups instead of one
    # 131k-scene batch (round-5 probes, scripts/bench_pipeline_probe.py +
    # docs/pipeline_probe_r5.json).  Two effects compound: (1) at 2048
    # scenes the whole step working set — and the batched observation-phase
    # pooling fold, which turns on below its ~64k agent-row gate — stays
    # VMEM-resident instead of spilling to HBM, and (2) groups are data-
    # independent, so the scheduler overlaps one group's VPU pooling with
    # another's MXU matmuls inside the unroll-2 window.  Measured sweep
    # (scenes/s): 1 group 367k, Python-loop 4/64 groups 377k/611k (compile
    # grows with G — 382 s at 64), lax.scan G=32/64/128/256 648k/719k/625k/
    # 653k with O(1) program size.  Same scenes, same math, same model.
    groups, group_unroll = 64, 2

    @jax.jit
    def rollout(params, xy, mask, goals, slot):
        gs = xy.shape[1] // groups
        # group-major stacks: [G, 9, gs, A, ...]
        xyg = jnp.moveaxis(xy[:9].reshape(9, groups, gs, a, 2), 1, 0)
        mg = jnp.moveaxis(mask[:9].reshape(9, groups, gs, a), 1, 0)
        gg = goals.reshape(groups, gs, a, 2)
        sg = slot.reshape(groups, gs, a)

        def body(total, xs):
            x, m, g, sl = xs
            rel, pred, valid = model.forward(
                params, x, m, g, sl, n_predict=12
            )
            # scalar reduce: forces full on-device execution; float() below is
            # the host sync (block_until_ready is unreliable through the
            # TPU tunnel)
            return total + jnp.sum(pred.astype(jnp.float32)), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0), (xyg, mg, gg, sg), unroll=group_unroll
        )
        return total

    args = (params, jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(goals), jnp.asarray(slot))
    float(rollout(*args))  # compile + warmup

    iters = 1 if _smoke_mode() else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        float(rollout(*args))
    dt = time.perf_counter() - t0

    scenes_per_sec = s * iters / dt
    flops_scene, bytes_scene = dlstm_cost_model(a, s, dtype_bytes=2)
    achieved_flops = scenes_per_sec * flops_scene
    mfu_pct = 100.0 * achieved_flops / V5E_PEAK_FLOPS["bfloat16"]
    hbm_pct = 100.0 * scenes_per_sec * bytes_scene / V5E_HBM_BYTES_PER_SEC
    trained_per_sec = train_throughput()
    # training roofline: the trainers run f32 (protocol default)
    train_flops_scene, _ = dlstm_train_cost_model(a=8, batch=8, dtype_bytes=4)
    train_mfu_pct = 100.0 * (trained_per_sec * train_flops_scene
                             ) / V5E_PEAK_FLOPS["float32"]
    return {
        "metric": "dlstm_rollout_scenes_per_sec",
        "value": round(scenes_per_sec, 1),
        "unit": "scenes/sec (9-obs/12-pred, A=8, directional pooling)",
        "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 2),
        "train_scenes_per_sec": round(trained_per_sec, 1),
        "train_vs_baseline": round(
            trained_per_sec / REFERENCE_TRAIN_SCENES_PER_SEC, 2
        ),
        "mfu_pct": round(mfu_pct, 2),
        "train_mfu_pct": round(train_mfu_pct, 2),
        "hbm_ceiling_pct": round(hbm_pct, 1),
    }


def _child_main():
    """Run one measurement attempt and print its JSON line (subprocess)."""
    if os.environ.get("BENCH_CPU"):
        # functional check without the TPU: JAX_PLATFORMS is ignored by the
        # axon plugin, so force the platform via config (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run_bench()), flush=True)


def _run_attempt(deadline):
    """Run one watchdogged attempt in a fresh subprocess.

    Returns the parsed result dict, or None on failure/stall.  A fresh
    process per attempt is essential: a stalled tunnel RPC blocks inside a
    C call (SIGALRM-proof), and a killed TPU client can leave its own state
    wedged — killing the whole process group is the only reliable reset.
    """
    import signal
    import subprocess

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=sys.stderr,
        start_new_session=True, text=True,
    )
    try:
        out, _ = proc.communicate(timeout=deadline)
    except subprocess.TimeoutExpired:
        print(f"bench: attempt stalled past {deadline}s deadline; killing",
              file=sys.stderr)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait()
        return None
    if proc.returncode != 0:
        print(f"bench: attempt exited rc={proc.returncode}", file=sys.stderr)
        return None
    for line in reversed(out.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            return parsed
    print("bench: attempt produced no JSON line", file=sys.stderr)
    return None


def main():
    deadlines = ATTEMPT_DEADLINES
    if not _tunnel_port_open():
        print(f"bench: tunnel relay port ({TUNNEL_PROBE}) refused — "
              "using short attempt deadlines", file=sys.stderr)
        deadlines = DEAD_TUNNEL_DEADLINES
    for attempt, deadline in enumerate(deadlines):
        result = _run_attempt(deadline)
        if result is not None:
            try:
                with open(LAST_GOOD_PATH, "w") as f:
                    json.dump(result, f)
            except OSError as e:
                print(f"bench: could not persist last-good: {e}",
                      file=sys.stderr)
            print(json.dumps(result))
            return 0
        if attempt < len(deadlines) - 1:
            print(f"bench: attempt {attempt + 1} failed; retrying",
                  file=sys.stderr)
            time.sleep(5)
    # all attempts exhausted: fall back to the last good capture, marked stale
    try:
        with open(LAST_GOOD_PATH) as f:
            last_good = json.load(f)
    except (OSError, json.JSONDecodeError):
        print("bench: no last-good result available", file=sys.stderr)
        return 1
    last_good["stale"] = True
    print(json.dumps(last_good))
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        _child_main()
    else:
        sys.exit(main())
