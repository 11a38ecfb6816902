"""Unit tests for hulc2_tpu.ops — parity with PyTorch library semantics and
analytic invariants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hulc2_tpu.ops import fnv, gripper_frame, logistic, preprocess, rotations, spatial


class TestFNV:
    def test_known_vectors(self):
        # FNV-1 32-bit reference vectors (http://www.isthe.com/chongo/tech/comp/fnv/)
        assert fnv.fnv1_32(b"") == 0x811C9DC5
        assert fnv.fnv1_32(b"a") == 0x050C5D7E
        assert fnv.fnv1_32(b"foobar") == 0x31F0B262

    def test_validation_window_deterministic_and_in_range(self):
        sizes = [fnv.get_validation_window_size(i, 20, 32) for i in range(1000)]
        assert all(20 <= s <= 32 for s in sizes)
        assert sizes == [fnv.get_validation_window_size(i, 20, 32) for i in range(1000)]
        assert len(set(sizes)) > 1  # actually varies


class TestRotations:
    def test_euler_matrix_roundtrip(self):
        rng = np.random.RandomState(0)
        e = rng.uniform(-1.4, 1.4, size=(64, 3)).astype(np.float32)
        m = rotations.euler_angles_to_matrix(jnp.asarray(e))
        e2 = rotations.matrix_to_euler_angles(m)
        np.testing.assert_allclose(np.asarray(e2), e, atol=1e-5)

    def test_matrix_is_rotation(self):
        e = jnp.asarray(np.random.RandomState(1).uniform(-3, 3, size=(32, 3)), dtype=jnp.float32)
        m = rotations.euler_angles_to_matrix(e)
        eye = jnp.swapaxes(m, -1, -2) @ m
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), 1.0, atol=1e-5)

    def test_euler_matches_scipy_convention(self):
        scipy = pytest.importorskip("scipy.spatial.transform")
        e = np.random.RandomState(2).uniform(-3, 3, size=(16, 3)).astype(np.float32)
        m = np.asarray(rotations.euler_angles_to_matrix(jnp.asarray(e)))
        # pytorch3d "XYZ" (intrinsic, Rx@Ry@Rz) == scipy intrinsic "XYZ"
        m_ref = scipy.Rotation.from_euler("XYZ", e).as_matrix()
        np.testing.assert_allclose(m, m_ref, atol=1e-5)

    def test_quaternion_roundtrip(self):
        e = jnp.asarray(np.random.RandomState(3).uniform(-3, 3, size=(32, 3)), dtype=jnp.float32)
        m = rotations.euler_angles_to_matrix(e)
        q = rotations.matrix_to_quaternion(m)
        m2 = rotations.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


class TestGripperFrame:
    def test_world_tcp_roundtrip(self):
        rng = np.random.RandomState(4)
        b, s = 4, 8
        action = rng.uniform(-1, 1, size=(b, s, 7)).astype(np.float32)
        robot_obs = rng.uniform(-1, 1, size=(b, s, 15)).astype(np.float32)
        tcp = gripper_frame.world_to_tcp_frame(jnp.asarray(action), jnp.asarray(robot_obs))
        back = gripper_frame.tcp_to_world_frame(tcp, jnp.asarray(robot_obs))
        np.testing.assert_allclose(np.asarray(back), action, atol=1e-3)

    def test_position_rotated_correctly(self):
        # robot pointing with yaw=pi/2 about z: world +x == tcp -y... verify via matrix
        action = jnp.zeros((1, 1, 7)).at[0, 0, 0].set(1.0)  # unit x translation
        robot_obs = jnp.zeros((1, 1, 15)).at[0, 0, 5].set(jnp.pi / 2)  # euler z
        tcp = gripper_frame.world_to_tcp_frame(action, robot_obs)
        np.testing.assert_allclose(np.asarray(tcp[0, 0, :3]), [0.0, -1.0, 0.0], atol=1e-6)

    def test_gripper_dim_passthrough(self):
        rng = np.random.RandomState(5)
        action = jnp.asarray(rng.uniform(-1, 1, size=(2, 3, 7)), dtype=jnp.float32)
        robot_obs = jnp.asarray(rng.uniform(-1, 1, size=(2, 3, 15)), dtype=jnp.float32)
        tcp = gripper_frame.world_to_tcp_frame(action, robot_obs)
        np.testing.assert_allclose(np.asarray(tcp[..., -1]), np.asarray(action[..., -1]))

    def test_gimbal_lock_stays_finite(self):
        """pitch = +-pi/2 (asin boundary) must not produce NaNs — the clamped
        asin replaces the reference's quaternion fallback
        (gripper_control.py:51-55)."""
        action = jnp.asarray(np.full((2, 1, 7), 0.3, np.float32))
        robot_obs = jnp.zeros((2, 1, 15)).at[0, 0, 4].set(jnp.pi / 2).at[1, 0, 4].set(-jnp.pi / 2)
        tcp = gripper_frame.world_to_tcp_frame(action, robot_obs)
        back = gripper_frame.tcp_to_world_frame(tcp, robot_obs)
        assert np.isfinite(np.asarray(tcp)).all()
        assert np.isfinite(np.asarray(back)).all()

    def test_finite_checks_raise_on_nan_inputs(self):
        """--debug-nans mode: non-finite euler inputs fail loudly
        (reference NaN asserts, gripper_control.py:35,62)."""
        import jax

        action = jnp.zeros((1, 1, 7))
        bad_obs = jnp.zeros((1, 1, 15)).at[0, 0, 4].set(jnp.nan)
        # silent by default (zero-overhead hot path)
        out = gripper_frame.world_to_tcp_frame(action, bad_obs)
        assert np.isnan(np.asarray(out)).any()
        gripper_frame.enable_finite_checks(True)
        try:
            with pytest.raises(Exception, match="non-finite"):
                jax.block_until_ready(gripper_frame.world_to_tcp_frame(action, bad_obs))
        finally:
            gripper_frame.enable_finite_checks(False)


class TestLogisticMixture:
    def _params(self, seed=0, b=4, s=8, a=6, k=10):
        rng = np.random.RandomState(seed)
        return (
            jnp.asarray(rng.randn(b, s, a, k), dtype=jnp.float32),
            jnp.asarray(rng.randn(b, s, a, k) * 0.5, dtype=jnp.float32),
            jnp.asarray(rng.randn(b, s, a, k) * 0.3, dtype=jnp.float32),
            jnp.asarray(np.clip(rng.randn(b, s, a) * 0.3, -0.99, 0.99), dtype=jnp.float32),
        )

    def test_loss_matches_numpy_rederivation(self):
        logit_probs, log_scales, means, targets = self._params()
        loss = logistic.logistic_mixture_loss(
            logit_probs, log_scales, means, targets, -1.0, 1.0, num_classes=10
        )
        # independent numpy re-derivation of the discretized logistic likelihood
        lp, ls, m, t = (np.asarray(v, dtype=np.float64) for v in (logit_probs, log_scales, means, targets))
        ls = np.maximum(ls, -7.0)
        x = t[..., None]
        inv = np.exp(-ls)
        half_bin = 2.0 / 2.0 / 9
        sig = lambda v: 1 / (1 + np.exp(-v))
        sp = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)
        plus_in = inv * (x - m + half_bin)
        min_in = inv * (x - m - half_bin)
        cdf_delta = sig(plus_in) - sig(min_in)
        mid_in = inv * (x - m)
        log_probs = np.where(
            x < -1.0 + 1e-3,
            plus_in - sp(plus_in),
            np.where(
                x > 1.0 - 1e-3,
                -sp(min_in),
                np.where(
                    cdf_delta > 1e-5,
                    np.log(np.maximum(cdf_delta, 1e-12)),
                    mid_in - ls - 2 * sp(mid_in) - np.log(9 / 2),
                ),
            ),
        )
        log_probs = log_probs + lp - np.log(np.sum(np.exp(lp), axis=-1, keepdims=True))
        mx = log_probs.max(-1, keepdims=True)
        lse = (mx + np.log(np.sum(np.exp(log_probs - mx), axis=-1, keepdims=True)))[..., 0]
        expected = -np.mean(np.sum(lse, axis=-1))
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_sample_statistics(self):
        # single sharp component at mean 0.5 -> samples concentrate there
        k = 10
        logit_probs = jnp.full((5000, 1, k), -100.0).at[..., 3].set(10.0)
        log_scales = jnp.full((5000, 1, k), -5.0)
        means = jnp.zeros((5000, 1, k)).at[..., 3].set(0.5)
        s = logistic.logistic_mixture_sample(jax.random.PRNGKey(0), logit_probs, log_scales, means)
        assert abs(float(jnp.mean(s)) - 0.5) < 0.01
        assert float(jnp.std(s)) < 0.05

    def test_sharp_mixture_recovers_target(self):
        logit_probs, log_scales, means, targets = self._params()
        # loss at the mixture means with tiny scales should be much lower than random
        tight = logistic.logistic_mixture_loss(
            logit_probs, jnp.full_like(log_scales, -6.0), jnp.repeat(targets[..., None], 10, -1),
            targets, -1.0, 1.0, num_classes=10,
        )
        loose = logistic.logistic_mixture_loss(
            logit_probs, log_scales, means, targets, -1.0, 1.0, num_classes=10
        )
        assert float(tight) < float(loose)


class TestSpatialSoftmax:
    def test_peaked_feature_returns_its_coordinates(self):
        h, w, c = 15, 21, 3
        feat = np.zeros((1, h, w, c), dtype=np.float32)
        peaks = [(0, 0), (7, 10), (14, 20)]
        for ch, (r, cc) in enumerate(peaks):
            feat[0, r, cc, ch] = 100.0
        out = np.asarray(spatial.spatial_softmax(jnp.asarray(feat), jnp.asarray(1.0)))
        xs = np.linspace(-1, 1, h)
        ys = np.linspace(-1, 1, w)
        for ch, (r, cc) in enumerate(peaks):
            np.testing.assert_allclose(out[0, 2 * ch], xs[r], atol=1e-4)
            np.testing.assert_allclose(out[0, 2 * ch + 1], ys[cc], atol=1e-4)

    def test_matches_torch_reference_formulation(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(7)
        n, c, h, w = 2, 4, 15, 21
        feat = rng.randn(n, c, h, w).astype(np.float32)
        temp = 1.0
        # the reference formulation on NCHW (vision_network.py:100-108)
        gx, gy = torch.meshgrid(
            torch.linspace(-1.0, 1.0, h), torch.linspace(-1.0, 1.0, w), indexing="ij"
        )  # num_cols=h, num_rows=w as wired by VisionNetwork
        x_map = gx.reshape(-1)
        y_map = gy.reshape(-1)
        t = torch.from_numpy(feat).contiguous().view(-1, h * w)
        attn = F.softmax(t / temp, dim=1)
        ex = torch.sum(x_map * attn, dim=1, keepdim=True)
        ey = torch.sum(y_map * attn, dim=1, keepdim=True)
        expected = torch.cat((ex, ey), 1).view(-1, c * 2).numpy()

        ours = np.asarray(
            spatial.spatial_softmax(jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(temp))
        )
        np.testing.assert_allclose(ours, expected, atol=1e-5)


class TestPreprocess:
    def test_scale_and_normalize(self):
        x = jnp.asarray(np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1))
        y = preprocess.scale_and_normalize(x, mean=[0.5], std=[0.5])
        np.testing.assert_allclose(float(y.min()), -1.0, atol=1e-6)
        np.testing.assert_allclose(float(y.max()), 1.0, atol=1e-6)

    def test_random_shift_matches_torch_grid_sample(self):
        """Prove the pad+crop formulation equals the reference's grid_sample."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        pad = 10
        rng = np.random.RandomState(8)
        imgs = rng.randint(0, 255, size=(3, 32, 32, 3)).astype(np.float32)
        shifted = np.asarray(preprocess.random_shift(jax.random.PRNGKey(0), jnp.asarray(imgs), pad))

        # recover the offsets actually drawn, then reproduce via grid_sample
        offsets = np.asarray(jax.random.randint(jax.random.PRNGKey(0), (3, 2), 0, 2 * pad + 1))
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        n, c, h, w = x.shape
        x_p = F.pad(x, (pad,) * 4, "replicate")
        eps = 1.0 / (h + 2 * pad)
        arange = torch.linspace(-1.0 + eps, 1.0 - eps, h + 2 * pad, dtype=torch.float32)[:h]
        arange = arange.unsqueeze(0).repeat(h, 1).unsqueeze(2)
        base_grid = torch.cat([arange, arange.transpose(1, 0)], dim=2).unsqueeze(0).repeat(n, 1, 1, 1)
        # grid x coordinate indexes width: use offsets[:, 1] for x, offsets[:, 0] for y
        shift = torch.from_numpy(
            np.stack([offsets[:, 1], offsets[:, 0]], axis=-1).astype(np.float32)
        ).view(n, 1, 1, 2)
        shift = shift * 2.0 / (h + 2 * pad)
        out = F.grid_sample(x_p, base_grid + shift, padding_mode="zeros", align_corners=False)
        expected = out.numpy().transpose(0, 2, 3, 1)
        # grid_sample's fp32 grid coords round to ~1e-3 of exact pixel centers
        # on 0..255-valued pixels; our dynamic_slice crop is the exact version.
        np.testing.assert_allclose(shifted, expected, atol=5e-3)

    def test_random_crop_in_bounds(self):
        x = jnp.asarray(np.random.RandomState(9).rand(4, 70, 70, 3), dtype=jnp.float32)
        y = preprocess.random_crop(jax.random.PRNGKey(1), x, 64, 64)
        assert y.shape == (4, 64, 64, 3)

    def test_color_jitter_identity_when_prob_zero(self):
        x = jnp.asarray(np.random.RandomState(10).rand(2, 8, 8, 3), dtype=jnp.float32)
        y = preprocess.color_jitter(jax.random.PRNGKey(2), x, prob=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_resize_noop(self):
        x = jnp.asarray(np.random.RandomState(11).rand(2, 84, 84, 3), dtype=jnp.float32)
        assert preprocess.resize(x, 84, 84) is x


class TestPallasShift:
    def test_interpret_matches_reference(self):
        """Pallas fused crop+normalize == slice-based reference (interpret
        mode on CPU; compiled exactness is covered by the TPU bench script)."""
        from hulc2_tpu.ops.pallas_shift import random_shift_normalize_pallas

        rng_np = np.random.RandomState(0)
        imgs = jnp.asarray(rng_np.randint(0, 256, (4, 32, 32, 3)), jnp.uint8)
        key = jax.random.PRNGKey(1)
        out = preprocess.scale_and_normalize(
            preprocess.random_shift_slices(key, imgs, 4), [0.5], [0.5]
        )
        got = random_shift_normalize_pallas(key, imgs, 4, [0.5], [0.5], jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(out), atol=1e-6)

    def test_matmul_shift_matches_slices(self):
        rng_np = np.random.RandomState(1)
        imgs = jnp.asarray(rng_np.randint(0, 256, (8, 40, 40, 3)), jnp.uint8)
        key = jax.random.PRNGKey(2)
        a = preprocess.random_shift(key, imgs, 6)
        b = preprocess.random_shift_slices(key, imgs, 6).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shift_from_offsets_float_exact(self):
        """float32 one-hot selections crop real-valued images exactly
        (vs the padded dynamic-slice oracle with the same offsets)."""
        rng_np = np.random.RandomState(9)
        imgs = jnp.asarray(rng_np.rand(6, 36, 36, 3), jnp.float32)
        offsets = jnp.asarray(rng_np.randint(0, 11, (6, 2)))
        pad = 5
        got = preprocess.shift_from_offsets(offsets, imgs, pad, sel_dtype=jnp.float32)
        padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        ref = jax.vmap(lambda im, off: jax.lax.dynamic_slice(im, (off[0], off[1], 0), (36, 36, 3)))(
            padded, offsets
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
