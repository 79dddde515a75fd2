"""Config-derivation rules of the staged pipeline runner (pure, no training).

The hardware run that motivated these: a warm-chained stage keeping its
in-run `pretrain nerf` gate trained zero semantics under --steps 300.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import run_staged


def _derive(name="kitti360_panoptic", prev="", steps=0, opts=()):
    common = list(opts)
    return run_staged.stage_cfg(name, prev, steps, common, set(opts[::2]))


def test_warm_chain_drops_pretrain_gate():
    cfg, notes = _derive(prev="some/ckpt", steps=300)
    assert cfg.train.pretrain == ""
    assert cfg.train.init_from == "some/ckpt"
    assert any("gate dropped" in n for n in notes)


def test_first_stage_keeps_config_pretrain_scaled():
    cfg, notes = _derive(steps=300)  # no chain: config's pretrain stays
    assert cfg.train.pretrain == "nerf"
    assert cfg.train.pretrain_steps == 150  # split to fit --steps
    assert any("scaled" in n for n in notes)


def test_user_pretrain_overrides_survive():
    cfg, _ = _derive(prev="some/ckpt", steps=300,
                     opts=("train.pretrain", "nerf",
                           "train.pretrain_steps", "999999"))
    assert cfg.train.pretrain == "nerf"          # user wins over gate drop
    assert cfg.train.pretrain_steps == 999999    # user wins over the clamp


def test_user_init_from_overrides_chain():
    cfg, _ = _derive(prev="auto/ckpt", opts=("train.init_from", "mine/ckpt"))
    assert cfg.train.init_from == "mine/ckpt"


def test_360_stage_derivation():
    """--fisheye appends the kitti360_360 stage; warm-chained it drops the
    in-run pretrain gate and keeps joint fisheye batches on."""
    assert run_staged.STAGE_360 == "kitti360_360"
    cfg, notes = _derive(name=run_staged.STAGE_360, prev="pan/ckpt", steps=500)
    assert cfg.data.use_fisheye is True
    assert cfg.train.pretrain == ""
    assert cfg.train.init_from == "pan/ckpt"
    assert any("gate dropped" in n for n in notes)
