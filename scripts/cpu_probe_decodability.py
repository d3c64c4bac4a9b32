"""Nearest-canonical-cell probe (matmul NN): patch->position decodability."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from diffassemble_tpu.data.datasets import SyntheticImages
from diffassemble_tpu.data.patchify import patchify

def probe(canonical, hf_detail=0.0, hw=30, n_eval=6, seed=2000, K=16):
    ds0 = SyntheticImages((hw*32, hw*32), n=K, seed=0, cache=False,
                          canonical=canonical, hf_detail=hf_detail)
    ref = np.zeros((hw*hw, 32*32*3), np.float32)
    for i in range(K):
        ref += patchify(np.asarray(ds0[i], np.float32), hw, hw, 32).reshape(hw*hw, -1)
    ref /= K
    rn = (ref**2).sum(1)
    dse = SyntheticImages((hw*32, hw*32), n=n_eval, seed=seed, cache=False,
                          canonical=canonical, hf_detail=hf_detail)
    acc = tot = 0
    for i in range(n_eval):
        p = patchify(np.asarray(dse[i], np.float32), hw, hw, 32).reshape(hw*hw, -1)
        d = (p**2).sum(1)[:, None] + rn[None, :] - 2.0 * (p @ ref.T)
        pred = d.argmin(1)
        acc += (pred == np.arange(hw*hw)).sum(); tot += hw*hw
    return acc / tot

for cw, hf in ((0.5, 0.0), (0.8, 0.0), (0.5, 0.1), (0.5, 0.15), (0.5, 0.25), (0.8, 0.15), (0.8, 0.25)):
    print(f"canonical={cw} hf={hf}: cell-NN acc = {probe(cw, hf):.4f}", flush=True)
