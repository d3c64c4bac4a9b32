import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from types import SimpleNamespace as NS
from diffassemble_tpu.cli.train_3d import build_3d
from diffassemble_tpu.train.trainer import fragment_adapter, batch_iterator
from diffassemble_tpu.data.batch import FragmentBatch
args = NS(batch_size=16, gpus=1, steps=300, dataset="synthetic", sampling="DDIM", inference_ratio=10,
          n_layers=4, lr=1e-4, classifier_free_w=0.2, classifier_free_prob=0.0, checkpoint_path="",
          run_dir="/tmp/x", noise_weight=0.0, predict_xstart=True, backbone="pointnet",
          architecture="transformer", freeze_backbone=False, loss_type="all", category="",
          evaluate=False, max_steps=2, max_num_part=20, min_num_part=2, use_6dof_rot=False,
          use_vn_dgcnn_equiv_inv_mp=False, missing=0, num_iter=1, export_meshes=False,
          compute_dtype="bfloat16", seed=0, data_dir=None)
model, train_ds, test_ds, cats = build_3d(args)
adapter = fragment_adapter(20, cats, missing_perc=0, seed=0)
rng = np.random.default_rng(0)
nb = next(iter(batch_iterator(train_ds, 16, 20, rng, collate=adapter.collate)))
jb = FragmentBatch(*[jnp.asarray(a) for a in nb])
print("devices", jax.devices(), flush=True)
params = model.init(jax.random.PRNGKey(0), jb)
@jax.jit
def grads(params, batch, key):
    (l, aux), g = jax.value_and_grad(model.loss, has_aux=True)(params, batch, key)
    return l, g
l, g = grads(params, jb, jax.random.PRNGKey(1))
print("loss %.6f" % float(l), flush=True)
print("g_enc %.8f" % float(optax.global_norm(g["encoder"])), flush=True)
print("g_den %.8f" % float(optax.global_norm(g["denoiser"])), flush=True)
for k, v in g["encoder"].items():
    print("  enc", k, "%.8f" % float(optax.global_norm(v)), flush=True)
