"""A/B: XLA vs Pallas attention for the 30x30 sampler on TPU."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import os, time, sys
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle
    from diffassemble_tpu.data.expander import expander_mask
    from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig

    HW, B = (30, 30), 2
    N = 900
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

    for impl in (sys.argv[1:] or ["xla", "pallas"]):
        cfg = Diffusion2DConfig(
            steps=300, inference_ratio=10, sampling="ddim", mean_type="xstart",
            rotation=True, backbone="efficientnet_b0", architecture="exophormer",
            virt_nodes=8, n_layers=4, compute_dtype="bfloat16", attention_impl=impl,
        )
        model = Diffusion2D(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        run = jax.jit(lambda p, b, k: model.sample(p, b, k).final)
        t0 = time.time()
        out = run(params, batch, jax.random.PRNGKey(1)); out.block_until_ready()
        compile_s = time.time() - t0
        times = []
        for i in range(4):
            t0 = time.time()
            out = run(params, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
            out.block_until_ready()
            times.append(time.time() - t0)
        print(f"{impl}: compile={compile_s:.1f}s best={min(times)/B*1000:.2f} ms/puzzle "
              f"all={[round(t/B*1000,2) for t in times]}", flush=True)

main()
