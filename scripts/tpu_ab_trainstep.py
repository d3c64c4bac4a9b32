"""Train-step A/B at N=900: XLA vs Pallas attention × remat × batch size.

VERDICT r1 item #7 / r2 item #4 deliverable: step time + peak HBM for the
30x30 TRAINING path (the regime where the reference needed its 50->20 GB
sparsity tricks, README.md:33-34). The Pallas kernel has a fused flash-style
backward (ops/pallas_attention.py); remat additionally rematerializes
attention layers.

HBM is measured two ways:
  * `memory_analysis()` on the AOT-compiled executable — XLA's static
    accounting (args + temp + output), backend-independent (round-2 finding:
    `memory_stats()` returns {} through the axon tunnel, so the runtime
    counter shows 0 there);
  * `memory_stats()['peak_bytes_in_use']` where the backend provides it.

All configs run in ONE process (one TPU claim — a new claim costs 5-10 min):

  python scripts/tpu_ab_trainstep.py [configs…]
  # default sweep: xla/pallas × remat × batch 8, pallas batch 16/32

Each config appends one JSON record to runs/ab-trainstep/results.jsonl.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import time

import numpy as np

DEFAULT_SWEEP = [
    ("xla", 0, 8), ("pallas", 0, 8),
    ("xla", 1, 8), ("pallas", 1, 8),
    ("pallas", 0, 16), ("pallas", 0, 32),
]


def make_batch(B, N, HW, rng, adj):
    import jax.numpy as jnp

    from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle

    samples = []
    for i in range(B):
        img = rng.random((HW[0] * 32, HW[1] * 32, 3), dtype=np.float32)
        s = make_puzzle(img, HW[0], HW[1], 32, rotation=True, rng=rng)
        s["adj"] = adj
        s["patches_dim"] = np.array(HW, dtype=np.int32)
        samples.append(s)
    nb = collate_puzzles(samples, n_max=N)
    return PuzzleBatch(*[jnp.asarray(a) for a in nb])


def run_config(impl, remat, B, batch):
    import jax

    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from diffassemble_tpu.train.train_state import create_train_state, make_train_step

    cfg = Diffusion2DConfig(
        steps=300, inference_ratio=10, sampling="ddim", mean_type="xstart",
        rotation=True, backbone="efficientnet_b0", architecture="exophormer",
        virt_nodes=8, n_layers=4, compute_dtype="bfloat16",
        attention_impl=impl, remat=bool(remat),
    )
    model = Diffusion2D(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step_fn = make_train_step(model.loss, opt)

    t0 = time.time()
    lowered = step_fn.lower(state, batch)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "hbm_args_mb": round(getattr(ma, "argument_size_in_bytes", 0) / 1e6, 1),
            "hbm_temp_mb": round(getattr(ma, "temp_size_in_bytes", 0) / 1e6, 1),
            "hbm_output_mb": round(getattr(ma, "output_size_in_bytes", 0) / 1e6, 1),
            "hbm_total_mb": round(
                (getattr(ma, "argument_size_in_bytes", 0)
                 + getattr(ma, "temp_size_in_bytes", 0)
                 + getattr(ma, "output_size_in_bytes", 0)) / 1e6, 1),
        }
    except Exception as e:
        mem = {"memory_analysis_error": str(e)}

    state, aux = compiled(state, batch)
    jax.block_until_ready(aux["loss"])
    times = []
    for _ in range(5):
        t0 = time.time()
        state, aux = compiled(state, batch)
        jax.block_until_ready(aux["loss"])
        times.append(time.time() - t0)
    st = jax.local_devices()[0].memory_stats() or {}
    rec = {
        "impl": impl, "remat": bool(remat), "batch": B,
        "step_s": round(min(times), 4),
        "steps_per_s": round(1.0 / min(times), 2),
        "samples_per_s": round(B / min(times), 1),
        "compile_s": round(compile_s, 1),
        **mem,
        "peak_hbm_runtime_mb": round(st.get("peak_bytes_in_use", 0) / 1e6, 1),
        "loss": float(aux["loss"]),
    }
    del state, params, compiled, lowered
    return rec


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffassemble_tpu.data.expander import expander_mask

    if len(_sys.argv) > 1:
        sweep = []
        for tok in _sys.argv[1:]:
            impl, remat, b = tok.split(",")
            sweep.append((impl, int(remat), int(b)))
    else:
        sweep = DEFAULT_SWEEP

    HW, N = (30, 30), 900
    rng = np.random.default_rng(0)
    adj = expander_mask(N, "10%", rng)
    out = _pl.Path("runs/ab-trainstep")
    out.mkdir(parents=True, exist_ok=True)
    batches = {}
    for impl, remat, B in sweep:
        if B not in batches:
            batches[B] = make_batch(B, N, HW, rng, adj)
        print(f"=== {impl} remat={remat} batch={B}", flush=True)
        try:
            rec = run_config(impl, remat, B, batches[B])
        except Exception as e:
            rec = {"impl": impl, "remat": bool(remat), "batch": B, "error": str(e)[:500]}
        print(json.dumps(rec), flush=True)
        with open(out / "results.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
