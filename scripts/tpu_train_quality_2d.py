"""Long 2D quality run: 6x6 synthetic (fixed generator), flagship encoder."""
import time
t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from diffassemble_tpu.models.diffusion_2d import Diffusion2D, Diffusion2DConfig
from diffassemble_tpu.data import get_dataset
from diffassemble_tpu.train.trainer import Trainer

cfg = Diffusion2DConfig(
    steps=300, inference_ratio=10, sampling="ddim", mean_type="xstart",
    backbone="efficientnet_b0", architecture="transformer", n_layers=4,
    compute_dtype="bfloat16",
)
model = Diffusion2D(cfg)
train_ds, test_ds, _ = get_dataset("synthetic", puzzle_sizes=[6], train_n=4000, test_n=64)
trainer = Trainer(
    model, run_dir="runs/quality-6x6", max_steps=12000, batch_size=64,
    eval_every=2000, checkpoint_every=1000, sanity_eval_batches=0,
)
tick("setup done, starting fit")
state = trainer.fit(train_ds, test_ds)
tick("fit done; final eval")
m = trainer.evaluate(state.params, test_ds, tag="final")
tick(f"final: overall_acc={m.get('overall_acc'):.4f} piece_acc={m.get('overall__piece_acc'):.4f}")
