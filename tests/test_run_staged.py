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


def test_proposal_chain_shape_compatible():
    """--proposal D,W: the coarse-only stage trains its single field at the
    proposal size, so its params merge into the later stages' coarse trunk
    (same names AND shapes — coarse_field_cfg on both sides)."""
    import jax

    from panopticnerf_tpu.models import init_params, make_network

    d, w = 1, 8
    c1, n1 = run_staged.stage_cfg("kitti360_rgb_coarse", "", 0, [], set(),
                                  proposal=(d, w))
    assert c1.model.trunk_depth == d and c1.model.trunk_width == w
    assert all(s < d - 1 for s in c1.model.skips)
    assert any("proposal" in n for n in n1)

    c4, n4 = run_staged.stage_cfg("kitti360_panoptic", "prev/ckpt", 0, [],
                                  set(), proposal=(d, w))
    assert c4.model.coarse_trunk_depth == d
    assert c4.model.coarse_trunk_width == w

    # shrink everything else so param init is cheap on CPU
    for c in (c1, c4):
        c.model.num_classes = 4
        c.model.xyz_freqs = 2
        c.model.dir_freqs = 2
    c4.model.trunk_depth, c4.model.trunk_width = 2, 16  # tiny fine field
    p1 = init_params(make_network(c1), jax.random.key(0))["params"]["coarse"]
    p4 = init_params(make_network(c4), jax.random.key(0))["params"]["coarse"]
    fl = jax.tree_util.tree_flatten_with_path
    d1 = {jax.tree_util.keystr(k): v.shape for k, v in fl(p1)[0]}
    d4 = {jax.tree_util.keystr(k): v.shape for k, v in fl(p4)[0]}
    # every stage-1 leaf merges (same name, same shape) ...
    assert set(d1) <= set(d4)
    assert all(d1[k] == d4[k] for k in d1)
    # ... and the only fresh-init extras are the semantic heads (stage 1
    # trains geometry+rgb only), exactly as in the full-size chain.
    assert all("sem" in k for k in set(d4) - set(d1))


def test_tree_presets_scale_derivation():
    """--tree-* flags derive the padded capacities: primitives round up to
    a multiple of 8 over boxes+ground (floor 16), dense soups get a deeper
    interval budget, frame_num tracks the tree size."""
    d = dict(zip(*(iter(run_staged.tree_presets("/t")),) * 2))  # pairwise
    assert (d["data.max_primitives"], d["data.max_intervals"]) == ("16", "8")
    assert d["data.frame_num"] == "8"

    d = dict(zip(*(iter(run_staged.tree_presets(
        "/t", n_frames=16, hw=(94, 352), n_boxes=24)),) * 2))
    assert d["data.max_primitives"] == "32"  # 25 prims -> ceil8 = 32
    assert d["data.max_intervals"] == "12"
    assert d["data.frame_num"] == "16"

    d = dict(zip(*(iter(run_staged.tree_presets("/t", n_boxes=16)),) * 2))
    assert d["data.max_primitives"] == "24"  # 17 -> 24, above the floor


def test_tree_presets_concave_capacity():
    """Each concave L-building decomposes into 2 convex records, so the
    padded primitive capacity and interval budget must count them."""
    d = dict(zip(*(iter(run_staged.tree_presets("/t", n_boxes=14,
                                                n_concave=4)),) * 2))
    assert d["data.max_primitives"] == "24"  # 14+1+8=23 -> ceil8 = 24
    assert d["data.max_intervals"] == "12"   # effective 22 boxes > 12
