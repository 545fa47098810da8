"""Pin trajectory-metric semantics (VERDICT item 10).

evo is not installable here (zero egress), so the pinning is two-fold:
  1. closed-form invariants (Sim(3)-disturbance => zero ATE/RPE; a known
     single-pose rotation => exact RPE-rot RMSE);
  2. an INDEPENDENT inline re-implementation of evo's documented pipeline
     (reference src/evaluation/metrics.py:185-264: Umeyama align+scale on
     positions, APE translation_part RMSE; RPE delta=1 on the aligned
     trajectory with rotation_angle_deg / translation_part RMSE), written
     from evo's definitions rather than from evaluation/metrics.py, so a
     semantic drift in either implementation fails the cross-check.

Also pins the pose_metrics.json schema (auc@5/10/20/30 — the north-star
metric surfaces in the dumped file, not only in summary()).
"""
import json

import numpy as np

from vicasplat_tpu.evaluation.metrics import (
    ate,
    camera_eval_metrics,
    pose_auc,
    rpe,
)


def _random_trajectory(rng, n=12):
    poses = []
    p = np.eye(4)
    for _ in range(n):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        th = rng.uniform(0.05, 0.2)
        K = np.array([
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        step = np.eye(4)
        step[:3, :3] = R
        step[:3, 3] = rng.normal(size=3) * 0.3
        p = p @ step
        poses.append(p.copy())
    return np.stack(poses)


def _sim3(rng, scale):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    th = 0.7
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    t = rng.normal(size=3)
    return R, t, scale


# --- independent evo-style reimplementation (from evo's definitions) -------

def _umeyama_evo(src, dst):
    """evo.core.geometry.umeyama_alignment(src, dst, with_scale=True):
    src/dst are (3, N); returns R, t, s with dst ~ s*R@src + t."""
    mu_s = src.mean(1, keepdims=True)
    mu_d = dst.mean(1, keepdims=True)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd @ xs.T / src.shape[1]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs ** 2).sum() / src.shape[1]
    s = np.trace(np.diag(D) @ S) / var_s
    t = mu_d[:, 0] - s * R @ mu_s[:, 0]
    return R, t, s


def _evo_ate(gt, pr):
    R, t, s = _umeyama_evo(pr[:, :3, 3].T, gt[:, :3, 3].T)
    aligned = (s * R @ pr[:, :3, 3].T + t[:, None]).T
    return float(np.sqrt(((aligned - gt[:, :3, 3]) ** 2).sum(-1).mean()))


def _evo_rpe(gt, pr):
    R, t, s = _umeyama_evo(pr[:, :3, 3].T, gt[:, :3, 3].T)
    al = pr.copy()
    al[:, :3, 3] = (s * R @ pr[:, :3, 3].T + t[:, None]).T
    al[:, :3, :3] = R @ pr[:, :3, :3]
    tr_errs, rot_errs = [], []
    for i in range(len(gt) - 1):
        dq = np.linalg.inv(gt[i]) @ gt[i + 1]
        dp = np.linalg.inv(al[i]) @ al[i + 1]
        e = np.linalg.inv(dq) @ dp
        tr_errs.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rot_errs.append(np.degrees(np.arccos(c)))
    return (
        float(np.sqrt(np.mean(np.square(tr_errs)))),
        float(np.sqrt(np.mean(np.square(rot_errs)))),
    )


class TestTrajectoryGoldens:
    def test_sim3_disturbance_is_invisible(self):
        rng = np.random.default_rng(0)
        gt = _random_trajectory(rng)
        R, t, s = _sim3(rng, scale=2.7)
        pred = gt.copy()
        pred[:, :3, :3] = R @ gt[:, :3, :3]
        pred[:, :3, 3] = (s * R @ gt[:, :3, 3].T + t[:, None]).T
        assert ate(gt, pred) < 1e-9
        rpe_t, rpe_r = rpe(gt, pred)
        assert rpe_t < 1e-9 and rpe_r < 1e-6

    def test_known_rotation_perturbation_rpe(self):
        """Rotating ONE middle pose by theta yields RPE-rot RMSE
        theta * sqrt(2 / (N-1)) exactly (two consecutive pairs hit)."""
        rng = np.random.default_rng(1)
        gt = _random_trajectory(rng, n=9)
        pred = gt.copy()
        theta = 3.0  # degrees
        c, s_ = np.cos(np.radians(theta)), np.sin(np.radians(theta))
        Rz = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]])
        pred[4, :3, :3] = pred[4, :3, :3] @ Rz
        _, rpe_r = rpe(gt, pred)
        expected = theta * np.sqrt(2 / (len(gt) - 1))
        np.testing.assert_allclose(rpe_r, expected, rtol=1e-6)

    def test_cross_check_independent_evo_reimpl(self):
        rng = np.random.default_rng(2)
        gt = _random_trajectory(rng)
        pred = gt.copy()
        pred[:, :3, 3] += rng.normal(size=(len(gt), 3)) * 0.05
        # also twist each orientation slightly
        for i in range(len(pred)):
            th = rng.normal() * 0.02
            c, s_ = np.cos(th), np.sin(th)
            Rz = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]])
            pred[i, :3, :3] = pred[i, :3, :3] @ Rz
        np.testing.assert_allclose(ate(gt, pred), _evo_ate(gt, pred), rtol=1e-9)
        ours = rpe(gt, pred)
        theirs = _evo_rpe(gt, pred)
        np.testing.assert_allclose(ours, theirs, rtol=1e-9)

    def test_pose_auc_closed_form(self):
        # uniformly spread errors 1..20 over threshold 20:
        # recall ramps linearly => AUC ~ 0.5 (discrete trapezoid, exact below)
        errors = np.arange(1.0, 21.0)
        (auc20,) = pose_auc(errors, (20,))
        # hand-computed trapezoid over e=[0,1..19,20],
        # r=[0,0.05..0.95,0.95]: sum_{i=0..18}(0.05i+0.025) + 0.95, / 20
        np.testing.assert_allclose(auc20, 9.975 / 20, rtol=1e-9)
        # and all-below-threshold errors give AUC -> ~1
        (auc_hi,) = pose_auc(np.full(100, 0.01), (30,))
        assert auc_hi > 0.99


class TestPoseMetricsSchema:
    def test_dumped_json_has_aucs(self, tmp_path):
        import dataclasses

        from vicasplat_tpu.evaluation.pose_evaluator import (
            PoseEvalConfig,
            PoseEvaluator,
        )

        from collections import defaultdict

        cfg = PoseEvalConfig(output_path=str(tmp_path))
        ev = PoseEvaluator.__new__(PoseEvaluator)
        ev.cfg = cfg
        ev.metrics = defaultdict(list)
        rng = np.random.default_rng(3)
        gt = _random_trajectory(rng, n=6)
        pred = gt.copy()
        pred[:, :3, 3] += rng.normal(size=(6, 3)) * 0.02
        m = camera_eval_metrics(gt, pred)
        for k in ("ate", "rpe_trans", "rpe_rot"):
            ev.metrics[k].append(m[k])
        ev.metrics["rot_err_deg"].extend(m["rot_err_deg"].tolist())
        ev.metrics["trans_err_deg"].extend(m["trans_err_deg"].tolist())
        path = ev.dump()
        data = json.loads(path.read_text())
        for key in ("ate", "rpe_trans", "rpe_rot",
                    "auc@5", "auc@10", "auc@20", "auc@30"):
            assert key in data, f"pose_metrics.json missing {key}"


class TestPoseRefinement:
    def test_refine_runs_with_structure_term(self):
        """refine_steps>0 path: render-and-compare SE(3) refinement with the
        reference's (1 - SSIM structure) objective (pose_evaluator.py:130-141)
        must run and return finite, non-identical poses."""
        import jax
        import jax.numpy as jnp

        from tests.test_model import tiny_batch, tiny_cfg
        from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig
        from vicasplat_tpu.evaluation.pose_evaluator import (
            PoseEvalConfig,
            PoseEvaluator,
        )
        from vicasplat_tpu.models import init_vicasplat

        cfg = tiny_cfg()
        params = init_vicasplat(jax.random.PRNGKey(0), cfg)
        batch = tiny_batch(jax.random.PRNGKey(1), B=1)
        ctx = dict(
            batch,
            image=(batch["image"] + 1) / 2,
            near=jnp.full((1, 3), 0.1),
            far=jnp.full((1, 3), 100.0),
        )
        ev = PoseEvaluator(
            params, cfg, DecoderSplattingConfig(),
            PoseEvalConfig(refine_steps=2),
        )
        result = ev.evaluate_batch({"context": ctx, "scene": ["t"]})
        for k in ("ate", "rpe_trans", "rpe_rot"):
            assert k in result
