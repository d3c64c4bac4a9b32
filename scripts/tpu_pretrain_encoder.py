"""Self-supervised-style encoder pretraining: patch → (pos, rotvec) readout.

The reference's accuracy rests on ImageNet-pretrained efficientnet features
(visual_pretrained=True default, train_script.py:282); from COLD init both our
encoders descend the pose-readout task only after thousands of steps (probe:
runs/probe-encoder — every 400-step variant still at the mean floor), which is
exactly the cold-start the diffusion recipe cannot survive (the denoiser
collapses to the x_t shortcut / grid-mean first). No-egress equivalent of
pretraining: fit encoder+readout on the synthetic corpus directly, save the
encoder subtree, and start the diffusion recipe from it (config
`encoder_init`).

  python scripts/tpu_pretrain_encoder.py --backbone resnet18equiv \
      --out weights/resnet18equiv_pose6.npz --hw 6 --steps 10000
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import time

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn

from diffassemble_tpu.data.datasets import SyntheticImages
from diffassemble_tpu.nn.visual import make_visual_encoder
from diffassemble_tpu.train.device_data import build_device_data, gather_batch
from diffassemble_tpu.utils.params import save_params


class PoseReadout(nn.Module):
    """Encoder + small head predicting (x, y, cosθ, sinθ) per patch."""

    backbone: str
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        f = make_visual_encoder(self.backbone, dtype=dt)(x)
        # LayerNorms bracket the hidden layer: without them the two-layer
        # head collapses to the exact W1=W2=0 saddle within ~400 steps
        # (measured: loss pinned at the mean floor, grad 5.8 -> 0.01) --
        # normalization re-amplifies any nonzero projection, so the gradient
        # cannot die multiplicatively.
        h = nn.LayerNorm(name="head_ln0")(f.astype(jnp.float32))
        h = nn.gelu(nn.LayerNorm(name="head_ln1")(nn.Dense(128, name="head_0")(h)))
        return nn.Dense(4, name="head_1")(h)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backbone", default="resnet18equiv")
    ap.add_argument("--out", default="")
    ap.add_argument("--hw", type=int, default=6)
    ap.add_argument("--train_n", type=int, default=4000)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--canonical", type=float, default=0.5)
    ap.add_argument("--hf_detail", type=float, default=0.0)
    ap.add_argument("--degree", default="-1",
                    help="only used to locate a cached corpus npz")
    ap.add_argument("--style", default="default", choices=["default", "art"],
                    help="generator style (datasets.py); art = WikiArt-hardness")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    hw = (args.hw, args.hw)
    tagged = args.hw if args.style == "default" else f"{args.hw}{args.style}"
    out = args.out or f"weights/{args.backbone}_pose{tagged}.npz"
    _pl.Path(out).parent.mkdir(parents=True, exist_ok=True)

    def corpus(tag, n, img_seed):
        """Reuse the training scripts' cached corpora when present (the
        expander degree only affects adj, which pose pretraining ignores)."""
        from diffassemble_tpu.train.device_data import DevicePuzzleData

        ctag = "" if args.canonical == 0.5 else f"-c{args.canonical}"
        htag = "" if args.hf_detail == 0.0 else f"-hf{args.hf_detail}"
        htag += "" if args.style == "default" else f"-{args.style}"
        deg = str(args.degree).replace("%", "pct")
        f = _pl.Path(f"runs/_corpus/{tag}-hw{args.hw}-n{n}-s{img_seed}-d{deg}-g2{ctag}{htag}.npz")
        if f.exists():
            z = np.load(f)
            return DevicePuzzleData(*(jnp.asarray(z[k]) for k in ("patches", "grid", "adj", "hw")))
        imgs = SyntheticImages((hw[0] * 32, hw[1] * 32), n=n, seed=img_seed, cache=False,
                               canonical=args.canonical, hf_detail=args.hf_detail, style=args.style)
        return build_device_data(imgs, hw, n, degree=-1, seed=args.seed)

    data = corpus("train", args.train_n, args.seed)
    ev = corpus("eval", 64, args.seed + 1000)
    tick(f"devices: {jax.devices()}; corpus {data.patches.shape}")

    model = PoseReadout(args.backbone, args.dtype)
    first = gather_batch(data, jnp.arange(2), jax.random.PRNGKey(0))
    b, n = first.patches.shape[:2]
    flat = lambda p: (p.astype(jnp.float32) / 255.0).reshape(-1, 32, 32, 3)
    params = model.init(jax.random.PRNGKey(args.seed), flat(first.patches))["params"]
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, args.lr, 300),
         optax.cosine_decay_schedule(args.lr, max(args.steps - 300, 1))], [300]
    )
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def loss_fn(params, batch):
        pred = model.apply({"params": params}, flat(batch.patches)).reshape(
            batch.patches.shape[0], batch.patches.shape[1], 4
        )
        per = optax.huber_loss(pred, batch.x0, delta=1.0)
        return per.mean(), {"pos": per[..., :2].mean(), "rot": per[..., 2:].mean()}

    @jax.jit
    def step(params, opt_state, key, data):
        k_idx, k_rot = jax.random.split(key)
        idx = jax.random.randint(k_idx, (args.batch_size,), 0, data.patches.shape[0])
        batch = gather_batch(data, idx, k_rot)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        gn = optax.global_norm(grads)
        scale = jnp.minimum(1.0, 10.0 / (gn + 1e-9))
        grads = jax.tree.map(lambda g: g * scale, grads)
        upd, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, loss, aux, gn

    ev_chunk = 64 if args.hw <= 8 else 8

    @jax.jit
    def _ev_chunk_metrics(params, idx, key, ev):
        batch = gather_batch(ev, idx, key)
        pred = model.apply({"params": params}, flat(batch.patches)).reshape(idx.shape[0], -1, 4)
        # position accuracy: nearest grid cell; rotation: cos > cos(45°)
        d = jnp.linalg.norm(pred[..., None, :2] - batch.grid[:, None], axis=-1)
        pos_ok = jnp.argmin(d, -1) == jnp.arange(d.shape[1])[None]
        cos = jnp.sum(pred[..., 2:] * batch.x0[..., 2:], -1) / jnp.maximum(
            jnp.linalg.norm(pred[..., 2:], axis=-1), 1e-8
        )
        rot_ok = cos > jnp.cos(jnp.pi / 4)
        return pos_ok.mean(), rot_ok.mean()

    def ev_metrics(params, key):
        pas, ras = [], []
        for lo in range(0, 64, ev_chunk):
            pa, ra = _ev_chunk_metrics(params, jnp.arange(lo, lo + ev_chunk), key, ev)
            pas.append(float(pa)); ras.append(float(ra))
        return float(np.mean(pas)), float(np.mean(ras))

    key = jax.random.PRNGKey(args.seed + 1)
    enc_key = [k for k in params if not k.startswith("head_")][0]
    for s in range(1, args.steps + 1):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux, gn = step(params, opt_state, sub, data)
        if s % 200 == 0 or s == 1:
            pa, ra = ev_metrics(params, jax.random.PRNGKey(9))
            tick(
                f"step {s}: loss={float(loss):.4f} pos={float(aux['pos']):.4f} "
                f"rot={float(aux['rot']):.4f} gnorm={float(gn):.2f} "
                f"eval_pos_acc={float(pa):.4f} eval_rot_acc={float(ra):.4f}"
            )
        if s % 2000 == 0 or s == args.steps:
            save_params(out, {"encoder": params[enc_key]})
            tick(f"saved encoder → {out}")
    pa, ra = ev_metrics(params, jax.random.PRNGKey(9))
    tick(f"FINAL eval_pos_acc={float(pa):.4f} eval_rot_acc={float(ra):.4f}")


if __name__ == "__main__":
    main()
