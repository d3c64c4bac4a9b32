import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time, sys, json
t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
tick(f"jax up, devices={jax.devices()}")
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.data import PuzzleBatch, collate_puzzles, make_puzzle
from diffassemble_tpu.data.expander import expander_mask

HW=(30,30); N=900; B=1
cfg = Diffusion2DConfig(steps=300, inference_ratio=10, mean_type="xstart", rotation=True,
                        backbone="efficientnet_b0", architecture="exophormer", virt_nodes=8,
                        n_layers=4, compute_dtype="bfloat16")
model = Diffusion2D(cfg)
rng = np.random.default_rng(0)
adj = expander_mask(N, "10%", rng)
samples=[]
for i in range(B):
    img = rng.random((HW[0]*32, HW[1]*32, 3), dtype=np.float32)
    s = make_puzzle(img, HW[0], HW[1], 32, rotation=True, rng=rng)
    s["adj"]=adj; s["patches_dim"]=np.array(HW,dtype=np.int32)
    samples.append(s)
nb = collate_puzzles(samples, n_max=N)
batch = PuzzleBatch(*[jnp.asarray(a) for a in nb])
tick("batch ready")
params = model.init(jax.random.PRNGKey(0), batch)
tick("init done")

# 1) time one denoiser forward compile
feats = jax.jit(lambda p, x: model.visual_features(p, x))(params, batch.patches)
feats.block_until_ready(); tick(f"visual feats compiled+run {feats.shape}")
x = jnp.zeros_like(batch.x0); t = jnp.full(batch.x0.shape[:2], 299, dtype=jnp.int32)
f = jax.jit(lambda p, x, t, fe: model.denoise(p, x, t, fe, batch.adj, batch.node_mask))
out = f(params, x, t, feats); out.block_until_ready(); tick("denoise step compiled+run")
t1=time.time(); out = f(params, x, t, feats); out.block_until_ready(); tick(f"denoise step steady: {time.time()-t1:.4f}s")
# 2) full sampler
run = jax.jit(lambda p, b, k: model.sample(p, b, k).final)
out = run(params, batch, jax.random.PRNGKey(1)); out.block_until_ready(); tick("full sampler compiled+run")
for i in range(3):
    t1=time.time(); out = run(params, batch, jax.random.fold_in(jax.random.PRNGKey(1), i)); out.block_until_ready()
    tick(f"sampler steady: {time.time()-t1:.4f}s")
