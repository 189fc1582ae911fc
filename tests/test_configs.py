"""Every shipped config must resolve, build its pipeline, and init params.

Guards against config rot: a renamed model kwarg, a broken _base_ chain, or
a stale registry key in ANY configs/nerf/*.yml fails here, not at the start
of a multi-hour training run. (Dataset paths are not touched — data may not
be mounted.)"""

from pathlib import Path

import jax
import pytest

from yanerf_tpu.pipelines import PIPELINES
from yanerf_tpu.runners import create_optimizer
from yanerf_tpu.utils.config import Config

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs" / "nerf"
CONFIGS = sorted(CONFIG_DIR.glob("*.yml"))


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=lambda p: p.stem)
def test_config_resolves_builds_and_inits(cfg_path):
    cfg = Config.fromfile(str(cfg_path))
    # runner: the optimizer/schedule factory must accept the block
    assert "runner" in cfg and "pipeline" in cfg and "datasets" in cfg
    create_optimizer(cfg.runner)
    # pipeline: registry build + param init (full production widths)
    pipeline = PIPELINES.build(cfg.pipeline)
    params = pipeline.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_leaves(params), cfg_path.name
