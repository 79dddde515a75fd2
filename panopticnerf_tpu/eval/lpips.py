"""LPIPS perceptual similarity (AlexNet backbone), weights supplied by file.

The PanopticNeRF papers report LPIPS alongside PSNR/SSIM for appearance
([pn360] T-PAMI'25 experiments; reference snapshot has no code —
SURVEY.md §0). LPIPS needs pretrained conv weights, which are
download-gated offline, so the metric activates only when
`cfg.eval.lpips_weights` points at an .npz with the expected arrays
(produce one from the official checkpoints with
tools/convert_lpips_weights.py); otherwise the evaluator skips it.

Implements Zhang et al. 2018 (lpips 'alex', v0.1 lin layer):
  x in [0,1] -> x*2-1 -> (x - shift) / scale (ImageNet-ish stats)
  AlexNet conv features after each of the 5 ReLUs
  unit-normalize each feature map along channels
  d = sum_l mean_hw( sum_c lin_l_c * (f_l_pred - f_l_gt)^2 )

Runs as one jit per image shape via lax convolutions — the eval path is
per-frame and the conv stack is tiny next to a NeRF render.
"""

from __future__ import annotations

import numpy as np

# (out_ch, kernel, stride, pad, maxpool_after) for AlexNet 'features'
_ALEX_LAYERS = (
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _expected_keys() -> list[str]:
    keys = []
    for i in range(len(_ALEX_LAYERS)):
        keys += [f"conv{i}_w", f"conv{i}_b", f"lin{i}"]
    return keys


class LPIPS:
    """Callable (pred_hw3, gt_hw3 in [0,1]) -> float distance.

    Raises ValueError on a malformed weights file (missing arrays / wrong
    shapes) so the factory can surface a clear message and fall back to
    skipping the metric.
    """

    def __init__(self, weights_path: str):
        with np.load(weights_path) as z:
            missing = [k for k in _expected_keys() if k not in z]
            if missing:
                raise ValueError(
                    f"LPIPS weights file {weights_path!r} is missing arrays "
                    f"{missing}; expected the layout written by "
                    f"tools/convert_lpips_weights.py")
            self.conv_w, self.conv_b, self.lin = [], [], []
            in_ch = 3
            for i, (out_ch, k, _, _, _) in enumerate(_ALEX_LAYERS):
                w = np.asarray(z[f"conv{i}_w"], np.float32)
                b = np.asarray(z[f"conv{i}_b"], np.float32)
                lin = np.asarray(z[f"lin{i}"], np.float32).reshape(-1)
                if w.shape != (out_ch, in_ch, k, k):
                    raise ValueError(
                        f"conv{i}_w shape {w.shape} != {(out_ch, in_ch, k, k)}")
                if b.shape != (out_ch,) or lin.shape != (out_ch,):
                    raise ValueError(
                        f"conv{i}_b/lin{i} must be ({out_ch},); got "
                        f"{b.shape}/{lin.shape}")
                self.conv_w.append(w)
                self.conv_b.append(b)
                self.lin.append(lin)
                in_ch = out_ch
        self._jitted = None

    # -- forward -----------------------------------------------------------
    def _build(self):
        import jax
        import jax.numpy as jnp
        from jax import lax

        conv_w = [jnp.asarray(w) for w in self.conv_w]
        conv_b = [jnp.asarray(b) for b in self.conv_b]
        lin = [jnp.asarray(l) for l in self.lin]

        def features(x):  # x: (1, 3, H, W) scaled
            feats = []
            for i, (_, _, stride, pad, pool) in enumerate(_ALEX_LAYERS):
                x = lax.conv_general_dilated(
                    x, conv_w[i], (stride, stride),
                    [(pad, pad), (pad, pad)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                ) + conv_b[i][None, :, None, None]
                x = jnp.maximum(x, 0.0)
                feats.append(x)
                if pool:
                    x = lax.reduce_window(
                        x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                        "VALID")
            return feats

        def dist(pred, gt):  # (H, W, 3) in [0,1]
            def prep(im):
                im = im.astype(jnp.float32).transpose(2, 0, 1)[None]
                im = im * 2.0 - 1.0
                return (im - jnp.asarray(_SHIFT)[None, :, None, None]) \
                    / jnp.asarray(_SCALE)[None, :, None, None]

            fp, fg = features(prep(pred)), features(prep(gt))
            total = 0.0
            for i in range(len(fp)):
                np_ = fp[i] / jnp.sqrt(
                    jnp.sum(fp[i] ** 2, 1, keepdims=True) + 1e-10)
                ng = fg[i] / jnp.sqrt(
                    jnp.sum(fg[i] ** 2, 1, keepdims=True) + 1e-10)
                d = (np_ - ng) ** 2                       # (1, C, h, w)
                total = total + jnp.mean(
                    jnp.sum(d * lin[i][None, :, None, None], axis=1))
            return total

        return jax.jit(dist)

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float:
        h, w = pred.shape[:2]
        # the conv/pool pyramid needs ~4x stride * 2 pools of room; smaller
        # frames have no layer-5 features and the metric is undefined
        if min(h, w) < 48:
            return float("nan")
        if self._jitted is None:
            self._jitted = self._build()
        return float(self._jitted(pred, gt))


def make_lpips(weights_path: str, log=print):
    """LPIPS instance, or None when no/invalid weights (graceful skip)."""
    if not weights_path:
        return None
    try:
        return LPIPS(weights_path)
    except (OSError, ValueError) as e:
        log(f"LPIPS disabled: {e}")
        return None
