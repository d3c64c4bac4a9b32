"""TPU training smoke: synthetic 6x6, flagship encoder, checks learning."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time, sys
t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.data import get_dataset
from diffassemble_tpu.train.trainer import Trainer

cfg = Diffusion2DConfig(
    steps=300, inference_ratio=10, sampling="ddim", mean_type="xstart",
    backbone="efficientnet_b0", architecture="transformer", n_layers=4,
    compute_dtype="bfloat16",
)
model = Diffusion2D(cfg)
train_ds, test_ds, _ = get_dataset("synthetic", puzzle_sizes=[6], train_n=2000, test_n=48)
trainer = Trainer(
    model, run_dir="runs/tpu-smoke-6x6", max_steps=3000, batch_size=32,
    eval_every=1000, checkpoint_every=1000, sanity_eval_batches=0, log_quiet=False,
)
tick("setup done, starting fit")
state = trainer.fit(train_ds, test_ds)
tick("fit done; final eval")
m = trainer.evaluate(state.params, test_ds, tag="final")
tick(f"final: overall_acc={m.get('overall_acc'):.4f} piece_acc={m.get('overall__piece_acc'):.4f}")
