"""Distiller (DUSt3R teacher) + Regr3D loss tests with tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.loss.conf_point import Regr3DConfig, regr3d_loss
from vicasplat_tpu.models.dust3r import Dust3RConfig, dust3r_forward, init_dust3r


def tiny_cfg():
    return Dust3RConfig(
        img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
        enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
    )


class TestDust3R:
    def test_forward_shapes(self):
        cfg = tiny_cfg()
        params = init_dust3r(jax.random.PRNGKey(0), cfg)
        img1 = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
        img2 = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
        out = dust3r_forward(params, cfg, img1, img2, dtype=jnp.float32)
        assert out["view1"]["pts3d"].shape == (2, 32, 32, 3)
        assert out["view2"]["pts3d"].shape == (2, 32, 32, 3)
        assert out["view1"]["conf"].shape == (2, 32, 32)
        assert (out["view1"]["conf"] >= 1.0).all()
        assert jnp.isfinite(out["view1"]["pts3d"]).all()

    def test_views_are_coupled(self):
        """Changing view 2 must change view 1's prediction (cross-attn)."""
        cfg = tiny_cfg()
        params = init_dust3r(jax.random.PRNGKey(0), cfg)
        img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
        img2a = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2 - 1
        img2b = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
        a = dust3r_forward(params, cfg, img1, img2a, dtype=jnp.float32)
        b = dust3r_forward(params, cfg, img1, img2b, dtype=jnp.float32)
        assert float(jnp.abs(a["view1"]["pts3d"] - b["view1"]["pts3d"]).max()) > 1e-6


class TestRegr3D:
    def test_zero_at_match(self):
        key = jax.random.PRNGKey(0)
        pts = jax.random.normal(key, (1, 2, 8, 8, 3))
        conf = jnp.ones((1, 2, 8, 8)) * 2.0
        loss, logs = regr3d_loss(pts, conf, pts, conf)
        # point term = -alpha*log(conf) only (points match exactly)
        expected = -0.2 * np.log(2.0)
        np.testing.assert_allclose(float(logs["regr3d_point"]), expected, atol=1e-5)
        np.testing.assert_allclose(float(logs["regr3d_conf"]), 0.0, atol=1e-6)

    def test_quantile_masks_outliers(self):
        pts = jnp.ones((1, 1, 10, 10, 3))
        teacher = pts.at[0, 0, 0, 0].set(1e6)  # single huge outlier
        conf = jnp.ones((1, 1, 10, 10))
        loss_with, _ = regr3d_loss(pts, conf, teacher, conf)
        loss_clean, _ = regr3d_loss(pts, conf, pts, conf)
        # outlier pixel is quantile-masked: losses nearly equal
        np.testing.assert_allclose(float(loss_with), float(loss_clean), rtol=0.05)

    def test_grad_flows(self):
        key = jax.random.PRNGKey(0)
        teacher = jax.random.normal(key, (1, 2, 8, 8, 3))
        tconf = jnp.ones((1, 2, 8, 8)) * 3.0

        def f(p):
            loss, _ = regr3d_loss(p, jnp.full((1, 2, 8, 8), 2.0), teacher, tconf)
            return loss

        g = jax.grad(f)(jnp.zeros((1, 2, 8, 8, 3)))
        assert jnp.isfinite(g).all() and float(jnp.abs(g).max()) > 0
