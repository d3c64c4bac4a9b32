"""Train-step A/B at N=900: XLA vs Pallas attention vs +remat.

VERDICT r1 item #7 deliverable: step time + peak HBM for the 30x30 TRAINING
path (the regime where the reference needed its 50->20 GB sparsity tricks,
README.md:33-34). The Pallas kernel has a fused flash-style backward
(ops/pallas_attention.py); remat additionally rematerializes attention layers.

peak_bytes_in_use is cumulative per process, so ONE config runs per
invocation (the TPU claim survives within the process but not across):

  python scripts/tpu_ab_trainstep.py xla 0 [batch]
  python scripts/tpu_ab_trainstep.py pallas 0 [batch]
  python scripts/tpu_ab_trainstep.py pallas 1 [batch]

Each appends one JSON record to runs/ab-trainstep/results.jsonl.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle
    from diffassemble_tpu.data.expander import expander_mask
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
    from diffassemble_tpu.train.train_state import create_train_state, make_train_step

    impl = _sys.argv[1] if len(_sys.argv) > 1 else "xla"
    remat = bool(int(_sys.argv[2])) if len(_sys.argv) > 2 else False
    B = int(_sys.argv[3]) if len(_sys.argv) > 3 else 8
    HW, N = (30, 30), 900
    rng = np.random.default_rng(0)
    adj = expander_mask(N, "10%", rng)
    samples = []
    for i in range(B):
        img = rng.random((HW[0] * 32, HW[1] * 32, 3), dtype=np.float32)
        s = make_puzzle(img, HW[0], HW[1], 32, rotation=True, rng=rng)
        s["adj"] = adj
        s["patches_dim"] = np.array(HW, dtype=np.int32)
        samples.append(s)
    nb = collate_puzzles(samples, n_max=N)
    batch = PuzzleBatch(*[jnp.asarray(a) for a in nb])

    cfg = Diffusion2DConfig(
        steps=300, inference_ratio=10, sampling="ddim", mean_type="xstart",
        rotation=True, backbone="efficientnet_b0", architecture="exophormer",
        virt_nodes=8, n_layers=4, compute_dtype="bfloat16",
        attention_impl=impl, remat=remat,
    )
    model = Diffusion2D(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = model.make_optimizer()
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step_fn = make_train_step(model.loss, opt)
    t0 = time.time()
    state, aux = step_fn(state, batch)
    jax.block_until_ready(aux["loss"])
    compile_s = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        state, aux = step_fn(state, batch)
        jax.block_until_ready(aux["loss"])
        times.append(time.time() - t0)
    st = jax.local_devices()[0].memory_stats() or {}
    rec = {
        "impl": impl, "remat": remat, "batch": B,
        "step_s": round(min(times), 4),
        "steps_per_s": round(1.0 / min(times), 2),
        "compile_s": round(compile_s, 1),
        "peak_hbm_mb": round(st.get("peak_bytes_in_use", 0) / 1e6, 1),
        "loss": float(aux["loss"]),
    }
    print(json.dumps(rec), flush=True)
    out = _pl.Path("runs/ab-trainstep")
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
