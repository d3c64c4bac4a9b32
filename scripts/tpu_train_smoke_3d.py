"""TPU 3D training smoke: synthetic fractures, pointnet backbone."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time
t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax
from diffassemble_tpu.models.diffusion_3d import Diffusion3D, Diffusion3DConfig
from diffassemble_tpu.data.breaking_bad import get_dataset_3d
from diffassemble_tpu.train.trainer import Trainer, fragment_adapter

cfg = Diffusion3DConfig(
    steps=300, inference_ratio=10, backbone="pointnet", n_layers=4,
    max_num_part=8, compute_dtype="bfloat16",
)
model = Diffusion3D(cfg)
train_ds, test_ds, cats = get_dataset_3d("synthetic", train_n=512, test_n=32,
                                         num_points=256, max_num_part=8)
trainer = Trainer(
    model, run_dir="runs/tpu-smoke-3d", max_steps=1500, batch_size=16,
    eval_every=750, checkpoint_every=750, sanity_eval_batches=0,
    monitor="rmse_t_AVG", monitor_mode="min",
    adapter=fragment_adapter(8, cats),
)
tick("setup done, starting fit")
state = trainer.fit(train_ds, test_ds)
tick("fit done; final eval")
m = trainer.evaluate(state.params, test_ds, tag="final")
tick(f"final: rmse_t={m.get('rmse_t_AVG'):.4f} rmse_r={m.get('rmse_r_AVG'):.2f} part_acc={m.get('part_acc_AVG'):.4f}")
