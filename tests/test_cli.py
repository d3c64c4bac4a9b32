"""CLI surface tests: flag parsing, model dispatch, prefetch iterator."""

import argparse

import numpy as np
import pytest

from diffassemble_tpu.cli.common import add_2d_args, build_2d_model, percent
from diffassemble_tpu.data.prefetch import prefetch
from diffassemble_tpu.models.diffusion_2d import Diffusion2D
from diffassemble_tpu.models.diffusion_2d_discrete import (
    DiscreteDiffusion2D,
    DiscreteDiffusion2DRot,
)


def parse(argv):
    ap = argparse.ArgumentParser()
    add_2d_args(ap)
    return ap.parse_args(argv)


def test_percent_type():
    assert percent("60%") == "60%"
    assert percent("8") == 8
    with pytest.raises(ValueError):
        percent("abc%")


def test_default_flags_match_reference():
    args = parse([])
    assert args.steps == 300
    assert args.sampling == "DDIM"
    assert args.inference_ratio == 10
    assert args.degree == "100%"
    assert args.puzzle_sizes == [6]
    assert args.backbone == "efficientnet_b0"
    assert args.architecture == "transformer"


def test_model_dispatch_continuous():
    args = parse(["-steps", "20", "--backbone", "tiny"])
    model = build_2d_model(args)
    assert isinstance(model, Diffusion2D)
    assert model.cfg.steps == 20
    assert model.cfg.mean_type == "epsilon"


def test_model_dispatch_predict_xstart_rotation():
    args = parse(["--predict_xstart", "1", "--rotation", "1", "--backbone", "tiny"])
    model = build_2d_model(args)
    assert model.cfg.mean_type == "xstart"
    assert model.cfg.rotation and model.cfg.input_channels == 4


def test_model_dispatch_discrete():
    args = parse(["--discrete", "1", "-puzzle_sizes", "3", "--backbone", "tiny"])
    model = build_2d_model(args)
    assert isinstance(model, DiscreteDiffusion2D)
    assert model.cfg.n_classes == 9


def test_model_dispatch_discrete_rot_cold():
    args = parse(
        ["--discrete", "1", "--rotation", "1", "--cold_diffusion", "1",
         "-puzzle_sizes", "2", "--backbone", "tiny"]
    )
    model = build_2d_model(args)
    assert isinstance(model, DiscreteDiffusion2DRot)
    assert model.cfg.cold_diffusion


def test_3d_args_defaults():
    from diffassemble_tpu.cli.train_3d import add_3d_args

    ap = argparse.ArgumentParser()
    add_3d_args(ap)
    args = ap.parse_args([])
    assert args.backbone == "vn_dgcnn"
    assert args.predict_xstart is True
    assert args.max_num_part == 20


def test_prefetch_preserves_order_and_errors():
    assert list(prefetch(range(10))) == list(range(10))

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)
