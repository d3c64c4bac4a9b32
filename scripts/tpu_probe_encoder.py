"""Supervised encoder-trainability probe (round-2 rot-recipe blocker).

Measured: with aux_loss reading features only, the aux (a plain supervised
patch→pose regression through the encoder) collapses to the mean alongside
everything else — so the failure is NOT a diffusion shortcut: the
resnet18equiv encoder + optimizer combination cannot descend a simple
supervised readout. This probe trains encoder+linear-head on "patch →
(pos, rotvec)" directly and isolates the broken ingredient:

  E0 equiv_adafactor_bf16   — the failing recipe's combination
  E1 equiv_adafactor_f32    — dtype?
  E2 equiv_adam_bf16        — optimizer?
  E3 equiv_adam_f32         — both?
  E4 effnet_adafactor_bf16  — control (efficientnet trains in the recipe)

400 steps each, one TPU claim. Writes runs/probe-encoder/results.json.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import json
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

STEPS = 400
BATCH = 16
HW = (6, 6)
OUT = _pl.Path("runs/probe-encoder")
OUT.mkdir(parents=True, exist_ok=True)


class Readout(nn.Module):
    encoder: nn.Module

    @nn.compact
    def __call__(self, x):
        f = self.encoder(x)
        h = nn.gelu(nn.Dense(128)(f.astype(jnp.float32)))
        return nn.Dense(4)(h)


def adafactor():
    sched = lambda s: jnp.minimum(1e-2, 1.0 / jnp.sqrt(jnp.maximum(s, 1.0))) * jnp.minimum(1.0, s / 500.0)
    return optax.adafactor(learning_rate=sched, multiply_by_parameter_scale=True)


VARIANTS = {
    "E0_equiv_adafactor_bf16": ("resnet18equiv", "bfloat16", adafactor),
    "E1_equiv_adafactor_f32": ("resnet18equiv", "float32", adafactor),
    "E2_equiv_adam_bf16": ("resnet18equiv", "bfloat16", lambda: optax.adam(1e-3)),
    "E3_equiv_adam_f32": ("resnet18equiv", "float32", lambda: optax.adam(1e-3)),
    "E4_effnet_adafactor_bf16": ("efficientnet_b0", "bfloat16", adafactor),
}


def main():
    only = set(_sys.argv[1:])
    imgs = SyntheticImages((HW[0] * 32, HW[1] * 32), n=512, seed=0, cache=False)
    data = build_device_data(imgs, HW, 512, degree=-1)
    tick(f"devices: {jax.devices()}; corpus {data.patches.shape}")
    results = []
    for name, (backbone, dtype_s, mk_opt) in VARIANTS.items():
        if only and name not in only:
            continue
        tick(f"=== {name} ===")
        dt = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
        model = Readout(make_visual_encoder(backbone, dtype=dt))
        opt = mk_opt()

        def loss_fn(params, batch, key):
            b, n = batch.patches.shape[:2]
            x = (batch.patches.astype(jnp.float32) / 255.0).reshape(b * n, 32, 32, 3)
            pred = model.apply({"params": params}, x).reshape(b, n, 4)
            return jnp.mean(optax.huber_loss(pred, batch.x0, delta=1.0))

        first = gather_batch(data, jnp.arange(2), jax.random.PRNGKey(0))
        b, n = first.patches.shape[:2]
        params = model.init(
            jax.random.PRNGKey(0),
            (first.patches.astype(jnp.float32) / 255.0).reshape(b * n, 32, 32, 3),
        )["params"]
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            k_idx, k_rot, k2 = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (BATCH,), 0, data.n_samples)
            batch = gather_batch(data, idx, k_rot)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, k2)
            gn = optax.global_norm(grads)
            scale = jnp.minimum(1.0, 10.0 / (gn + 1e-9))
            grads = jax.tree.map(lambda g: g * scale, grads)
            upd, opt_state2 = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state2, loss, gn

        key = jax.random.PRNGKey(1)
        trace = []
        for s in range(1, STEPS + 1):
            key, sub = jax.random.split(key)
            params, opt_state, loss, gn = step(params, opt_state, sub)
            if s % 20 == 0 or s == 1:
                rec = {"step": s, "loss": float(loss), "grad_norm": float(gn)}
                trace.append(rec)
                tick(f"{name} {rec}")
        final = float(np.mean([r["loss"] for r in trace[-3:]]))
        verdict = "learns" if final < 0.18 else ("collapsed" if abs(final - 0.2417) < 0.015 else "unclear")
        results.append({"variant": name, "verdict": verdict, "final_loss": final, "trace": trace})
        (OUT / "results.json").write_text(json.dumps(results, indent=2))
        tick(f"{name}: {verdict} final={final:.4f}")
    for r in results:
        print(f"{r['variant']:28s} {r['verdict']:10s} {r['final_loss']:.4f}", flush=True)


if __name__ == "__main__":
    main()
