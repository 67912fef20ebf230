"""Flight-autonomy stack: detection kernels, ArUco decode (pinned against
OpenCV where available), and the closed-loop jittable mission controller.
Mirrors the reference client's capabilities (`ref/airsim/main.cpp`
detection + 15-state flight loop) — see tpu3drec/autonomy/."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drec.autonomy.aruco import (
    aruco_original_dictionary,
    decode_marker,
    match_task_list,
    render_marker,
)
from tpu3drec.autonomy.detect import (
    detect_color_blob,
    detect_rings,
    label_components,
    largest_blob,
    match_templates,
)

try:
    import cv2

    HAS_CV2_ARUCO = hasattr(cv2, "aruco")
except Exception:
    HAS_CV2_ARUCO = False


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestComponents:
    def test_label_components_two_blobs(self):
        mask = np.zeros((32, 32), bool)
        mask[2:6, 2:6] = True          # 16 px
        mask[20:30, 18:30] = True      # 120 px
        labels = np.asarray(label_components(jnp.asarray(mask)))
        ids = np.unique(labels[mask])
        assert len(ids) == 2
        assert np.all(labels[~mask] == 32 * 32)
        # each blob single-labeled
        assert len(np.unique(labels[2:6, 2:6])) == 1
        assert len(np.unique(labels[20:30, 18:30])) == 1

    def test_largest_blob_centroid_and_shape(self):
        # bright square target on dark ground — detect_squares_center
        # semantics (threshold, area priority, centroid)
        img = np.zeros((64, 96), np.float32)
        img[10:20, 5:15] = 1.0     # 100 px square
        img[30:60, 40:80] = 1.0    # 1200 px square (winner)
        blob = largest_blob(jnp.asarray(img)[None], thresh=0.5)
        assert bool(blob.found[0])
        assert abs(float(blob.cx[0]) - 59.5) < 0.6
        assert abs(float(blob.cy[0]) - 44.5) < 0.6
        # squares: circularity ~ pi/4
        assert 0.55 < float(blob.circularity[0]) < 1.0

    def test_largest_blob_batched_and_inverted(self):
        img = np.ones((2, 48, 48), np.float32)
        img[0, 10:20, 10:20] = 0.0
        img[1, 30:40, 5:25] = 0.0
        blob = largest_blob(jnp.asarray(img), thresh=0.5, invert=True)
        assert bool(blob.found[0]) and bool(blob.found[1])
        assert abs(float(blob.cx[0]) - 14.5) < 0.6
        assert abs(float(blob.cy[1]) - 34.5) < 0.6


class TestRings:
    def test_ring_detection_center_and_radius(self, rng):
        H, W = 120, 160
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        d = np.sqrt((ys - 70) ** 2 + (xs - 100) ** 2)
        img = 0.05 * rng.uniform(size=(H, W)).astype(np.float32)
        img[np.abs(d - 26) < 2.0] = 1.0
        ring = detect_rings(jnp.asarray(img)[None],
                            radii=(12, 20, 26, 32), stride=1)
        assert abs(float(ring.cx[0]) - 100) <= 2
        assert abs(float(ring.cy[0]) - 70) <= 2
        assert float(ring.radius[0]) == 26.0

    def test_ring_scores_rank_noise_below_ring(self, rng):
        H, W = 96, 96
        noise = 0.05 * rng.uniform(size=(H, W)).astype(np.float32)
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        d = np.sqrt((ys - 48) ** 2 + (xs - 48) ** 2)
        ringed = noise.copy()
        ringed[np.abs(d - 20) < 1.5] = 1.0
        r = detect_rings(jnp.asarray(np.stack([ringed, noise])),
                         radii=(16, 20, 24), stride=1)
        # contrast-ratio scores: >>1 on the ring, ~1-2 on noise, so a
        # fixed gate separates them
        assert float(r.score[0]) > 2.5 * float(r.score[1])
        assert float(r.score[0]) > 4.0
        assert float(r.score[1]) < 2.5


class TestTemplates:
    def test_match_templates_finds_location_and_id(self, rng):
        temps = rng.uniform(size=(9, 12, 12)).astype(np.float32)
        img = 0.5 * np.ones((2, 64, 64), np.float32)
        img[0, 20:32, 30:42] = temps[3]
        img[1, 5:17, 8:20] = temps[7]
        m = match_templates(jnp.asarray(img), jnp.asarray(temps))
        assert int(m.index[0]) == 3 and int(m.index[1]) == 7
        assert abs(float(m.cx[0]) - 35.5) < 1.0
        assert abs(float(m.cy[1]) - 10.5) < 1.0
        assert float(m.score[0]) > 0.9


class TestColorBlob:
    def test_tree_like_green_blob(self, rng):
        img = np.full((1, 48, 64, 3), 0.4, np.float32)
        img[0, 10:30, 20:40, 1] = 0.9  # green-dominant region
        blob = detect_color_blob(jnp.asarray(img), channel=1)
        assert bool(blob.found[0])
        assert abs(float(blob.cx[0]) - 29.5) < 1.0
        assert abs(float(blob.cy[0]) - 19.5) < 1.0


class TestAruco:
    def test_dictionary_structure(self):
        d = aruco_original_dictionary(1024)
        assert d.shape == (1024, 5, 5)
        # id 100 = pairs (00, 01, 10, 01, 00), row 0 most significant
        np.testing.assert_array_equal(
            d[100],
            [[1, 0, 0, 0, 0], [1, 0, 1, 1, 1], [0, 1, 0, 0, 1],
             [1, 0, 1, 1, 1], [1, 0, 0, 0, 0]])

    @pytest.mark.skipif(not HAS_CV2_ARUCO, reason="cv2.aruco unavailable")
    def test_dictionary_matches_opencv(self):
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
        mine = aruco_original_dictionary(1024)
        for mid in range(0, 1024, 137):
            ref = cv2.aruco.Dictionary.getBitsFromByteList(
                cvd.bytesList[mid:mid + 1].copy(), 5)
            np.testing.assert_array_equal(ref, mine[mid])

    def test_decode_own_rendering(self):
        for mid in (0, 17, 451, 1023):
            img = render_marker(mid, cell_px=10, border_px=24)
            det = decode_marker(jnp.asarray(img)[None])
            assert bool(det.found[0]), mid
            assert int(det.marker_id[0]) == mid
            assert int(det.hamming[0]) == 0

    def test_decode_rotated(self):
        img = render_marker(321, cell_px=10, border_px=24)
        for k in range(4):
            det = decode_marker(jnp.asarray(np.rot90(img, k).copy())[None])
            assert int(det.marker_id[0]) == 321, k

    @pytest.mark.skipif(not HAS_CV2_ARUCO, reason="cv2.aruco unavailable")
    def test_decode_opencv_rendering(self):
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
        for mid in (5, 99, 700):
            m = cv2.aruco.generateImageMarker(cvd, mid, 70)
            img = np.pad(m.astype(np.float32) / 255.0, 20,
                         constant_values=1.0)
            det = decode_marker(jnp.asarray(img)[None])
            assert bool(det.found[0]), mid
            assert int(det.marker_id[0]) == mid

    @pytest.mark.skipif(not HAS_CV2_ARUCO, reason="cv2.aruco unavailable")
    def test_opencv_detects_our_rendering(self):
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
        img = (render_marker(42, cell_px=10, border_px=30) * 255).astype(
            np.uint8)
        corners, ids, _ = cv2.aruco.ArucoDetector(cvd).detectMarkers(img)
        assert ids is not None and 42 in ids.flatten()

    def test_task_list(self):
        from tpu3drec.autonomy.aruco import MarkerDetection

        det = MarkerDetection(
            marker_id=jnp.asarray([5, -1, 99]),
            hamming=jnp.zeros(3, jnp.int32),
            corners=jnp.zeros((3, 4, 2)),
            found=jnp.asarray([True, False, True]),
        )
        got = match_task_list(det, jnp.asarray([99, 7, 5]))
        np.testing.assert_array_equal(np.asarray(got), [True, False, True])

    def test_reject_non_marker(self, rng):
        img = rng.uniform(size=(60, 60)).astype(np.float32)
        det = decode_marker(jnp.asarray(img)[None])
        assert not bool(det.found[0])


class TestMission:
    """Closed-loop: the jittable controller flies a simulated world through
    takeoff -> waypoints -> gate servoing -> dash -> scan -> park -> land,
    the reference's 15-branch loop as ONE lax.scan program."""

    def _world(self, cfg, gate_pos, pad_pos):
        """Jittable observation function: pinhole-projects the gate ring
        into the front camera (+x forward, y left, z up) and the pad into
        the below camera."""
        f = 200.0
        c0 = cfg.image_center

        def observe(pos):
            rel = gate_pos - pos
            depth = jnp.maximum(rel[0], 0.3)
            ring_px = jnp.stack([c0[0] - f * rel[1] / depth,
                                 c0[1] - f * rel[2] / depth])
            visible = (rel[0] > 0.5) & (jnp.abs(rel[1]) < 4.0) \
                & (jnp.abs(rel[2]) < 4.0)
            ring_score = jnp.where(visible, 0.9, 0.01)

            relp = pad_pos - pos
            alt = jnp.maximum(pos[2] - pad_pos[2], 0.3)
            blob_px = jnp.stack([c0[0] - f * relp[1] / alt,
                                 c0[1] - f * relp[0] / alt])
            blob_found = (jnp.abs(relp[0]) < 2.0) & (jnp.abs(relp[1]) < 2.0)
            return __import__("tpu3drec.autonomy.mission",
                              fromlist=["Observation"]).Observation(
                ring_px=ring_px, ring_score=ring_score,
                blob_px=blob_px, blob_found=blob_found,
                altitude=pos[2], position=pos,
                marker_ids=jnp.full((2,), -1, jnp.int32),
            )

        return observe

    def _cfg(self):
        from tpu3drec.autonomy.mission import MissionConfig

        return MissionConfig(
            waypoints=jnp.asarray([[2.0, 0.0, 4.0], [6.0, 0.0, 4.0]],
                                  jnp.float32),
            gate_waypoint=jnp.asarray([False, True]),
            task_ids=jnp.asarray([3, 8], jnp.int32),
            image_center=jnp.asarray([160.0, 120.0], jnp.float32),
            cruise_alt=4.0, scan_ticks=10, pass_ticks=15,
            servo_gain=(0.02, 0.0, 0.005),
        )

    def test_full_mission_reaches_landing(self):
        from tpu3drec.autonomy.mission import Phase, mission_rollout

        cfg = self._cfg()
        gate = jnp.asarray([9.0, 0.6, 4.4], jnp.float32)
        pad = jnp.asarray([13.0, 0.5, 0.0], jnp.float32)
        observe = self._world(cfg, gate, pad)
        state, traj, phases = mission_rollout(
            cfg, observe, n_steps=1200, start=jnp.zeros(3), dt=0.1)
        phases = np.asarray(phases)
        traj = np.asarray(traj)
        # every phase of the reference loop is visited, in order
        for ph in (Phase.TAKEOFF, Phase.NAV_WAYPOINT, Phase.SEARCH_GATE,
                   Phase.ALIGN_GATE, Phase.PASS_GATE, Phase.ARUCO_SCAN,
                   Phase.PARK_SEARCH, Phase.DESCEND, Phase.LANDED):
            assert (phases == int(ph)).any(), Phase(ph).name
        assert int(state.phase) == int(Phase.LANDED)
        # landed on the pad (the reference's park servo tolerance)
        final = traj[-1]
        assert abs(final[0] - 13.0) < 1.0
        assert abs(final[1] - 0.5) < 1.0
        assert final[2] <= 0.4
        # gate was passed near its center (servoing worked)
        through = traj[np.abs(traj[:, 0] - 9.0) < 0.3]
        assert len(through) > 0
        assert np.min(np.abs(through[:, 1] - 0.6)) < 0.5
        assert np.min(np.abs(through[:, 2] - 4.4)) < 0.5

    def test_mission_collects_task_markers(self):
        from tpu3drec.autonomy.mission import (
            Observation, mission_init, mission_step)

        cfg = self._cfg()
        state = mission_init(cfg)
        obs = Observation(
            ring_px=jnp.zeros(2), ring_score=jnp.float32(0),
            blob_px=jnp.zeros(2), blob_found=jnp.bool_(False),
            altitude=jnp.float32(0), position=jnp.zeros(3),
            marker_ids=jnp.asarray([8, -1], jnp.int32),
        )
        state, _ = mission_step(cfg, state, obs)
        np.testing.assert_array_equal(np.asarray(state.found_mask),
                                      [False, True])

    def test_mission_step_jits_once(self):
        """The whole tick is one compiled function (static shapes)."""
        from tpu3drec.autonomy.mission import (
            Observation, mission_init, mission_step)

        cfg = self._cfg()
        state = mission_init(cfg)
        obs = Observation(
            ring_px=jnp.zeros(2), ring_score=jnp.float32(0),
            blob_px=jnp.zeros(2), blob_found=jnp.bool_(False),
            altitude=jnp.float32(0), position=jnp.zeros(3),
            marker_ids=jnp.full((2,), -1, jnp.int32),
        )
        with jax.checking_leaks():
            state2, cmd = mission_step(cfg, state, obs)
        assert state2.phase.dtype == jnp.int32
        assert cmd.velocity.shape == (3,)


class TestPerceptionInTheLoop:
    """Detector-driven closed loop: every tick RENDERS the front camera
    in-graph, runs detect_rings on the rendered pixels, and feeds the
    detection to the controller — perception, decision, and dynamics all
    inside one lax.scan program (the reference round-trips every frame
    through OpenCV on the host)."""

    @pytest.mark.slow
    def test_mission_flies_through_rendered_gate(self):
        from tpu3drec.autonomy.mission import (
            MissionConfig, Observation, Phase, mission_rollout)

        H, W = 96, 128
        f = 110.0
        cfg = MissionConfig(
            waypoints=jnp.asarray([[4.0, 0.0, 4.0]], jnp.float32),
            gate_waypoint=jnp.asarray([True]),
            task_ids=jnp.asarray([1], jnp.int32),
            image_center=jnp.asarray([W / 2, H / 2], jnp.float32),
            cruise_alt=4.0, scan_ticks=10, pass_ticks=25,
            ring_score_min=2.5,  # contrast-ratio gate (detect_rings)
            servo_gain=(0.03, 0.0, 0.008),
        )
        gate = jnp.asarray([8.0, 0.8, 4.5], jnp.float32)
        gate_radius_m = 0.8
        radii = (6, 8, 10, 13, 16, 20)
        ys, xs = jnp.mgrid[0:H, 0:W]
        key = jax.random.PRNGKey(0)
        noise = 0.05 * jax.random.uniform(key, (H, W))

        def render_front(pos):
            rel = gate - pos
            depth = jnp.maximum(rel[0], 0.5)
            cx = W / 2 - f * rel[1] / depth
            cy = H / 2 - f * rel[2] / depth
            r_px = jnp.clip(f * gate_radius_m / depth, 3.0, 24.0)
            d = jnp.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
            ring = jnp.exp(-((d - r_px) ** 2) / (2.0 * 1.2 ** 2))
            vis = (rel[0] > 0.5).astype(jnp.float32)
            return jnp.clip(noise + vis * ring, 0.0, 1.0)

        from tpu3drec.autonomy.detect import detect_rings

        def observe(pos):
            img = render_front(pos)
            ring = detect_rings(img[None], radii=radii, stride=1)
            return Observation(
                ring_px=jnp.stack([ring.cx[0], ring.cy[0]]),
                ring_score=ring.score[0],
                blob_px=jnp.zeros(2), blob_found=jnp.bool_(False),
                altitude=pos[2], position=pos,
                marker_ids=jnp.full((1,), -1, jnp.int32),
            )

        state, traj, phases = mission_rollout(
            cfg, observe, n_steps=420, start=jnp.zeros(3), dt=0.1)
        phases = np.asarray(phases)
        traj = np.asarray(traj)
        # the detector found and the controller passed the gate
        assert (phases == int(Phase.ALIGN_GATE)).any()
        assert (phases == int(Phase.PASS_GATE)).any()
        through = traj[np.abs(traj[:, 0] - 8.0) < 0.25]
        assert len(through) > 0
        # gate crossed near its center: servoing on RENDERED pixels worked
        assert np.min(np.abs(through[:, 1] - 0.8)) < 0.45, through
        assert np.min(np.abs(through[:, 2] - 4.5)) < 0.45, through


class TestMissionShowcase:
    """The complete C1 story (VERDICT r3 stretch item 9): a MULTI-GATE +
    task-marker + landing-pad mission where EVERY phase is driven by real
    in-graph perception on rendered pixels — ring detection for two gates,
    ArUco decoding for the task markers, color-blob detection for the pad.
    One lax.scan program end to end: the reference's full competition loop
    (`ref/airsim/main.cpp:1653-3974`) with OpenCV+RPC round-trips replaced
    by batched device kernels."""

    @pytest.mark.slow
    def test_multi_gate_marker_pad_showcase(self):
        from tpu3drec.autonomy.aruco import decode_marker, render_marker
        from tpu3drec.autonomy.detect import detect_color_blob, detect_rings
        from tpu3drec.autonomy.mission import (
            MissionConfig, Observation, Phase, mission_rollout)

        H, W = 96, 128
        f = 110.0
        f_down = 80.0
        cfg = MissionConfig(
            waypoints=jnp.asarray(
                [[4.0, 0.0, 4.0], [12.0, 0.0, 4.0], [20.0, 0.0, 4.0]],
                jnp.float32),
            gate_waypoint=jnp.asarray([True, True, False]),
            task_ids=jnp.asarray([17, 451], jnp.int32),
            image_center=jnp.asarray([W / 2, H / 2], jnp.float32),
            cruise_alt=4.0, scan_ticks=14, pass_ticks=25,
            ring_score_min=2.5,
            servo_gain=(0.03, 0.0, 0.008),
        )
        gates = jnp.asarray([[8.0, 0.8, 4.5], [16.0, -0.6, 4.2]],
                            jnp.float32)
        gate_radius_m = 0.8
        radii = (6, 8, 10, 13, 16, 20)
        pad = jnp.asarray([27.0, 1.0, 0.0], jnp.float32)
        pad_radius_m = 0.6
        # task markers on the ground inside the ARUCO_SCAN sweep area
        marker_xy = jnp.asarray([[20.5, -0.9], [21.5, 0.9]], jnp.float32)
        marker_imgs = jnp.stack([
            jnp.asarray(render_marker(17, cell_px=8, border_px=16),
                        jnp.float32),
            jnp.asarray(render_marker(451, cell_px=8, border_px=16),
                        jnp.float32),
        ])  # (2, 88, 88) — fits the 96x128 down camera

        ys, xs = jnp.mgrid[0:H, 0:W]
        key = jax.random.PRNGKey(0)
        noise = 0.05 * jax.random.uniform(key, (H, W))

        def render_front(pos):
            # nearest gate ahead wins the frame
            rels = gates - pos
            ahead_d = jnp.where(rels[:, 0] > 0.5, rels[:, 0], 1e9)
            rel = rels[jnp.argmin(ahead_d)]
            depth = jnp.maximum(rel[0], 0.5)
            cx = W / 2 - f * rel[1] / depth
            cy = H / 2 - f * rel[2] / depth
            r_px = jnp.clip(f * gate_radius_m / depth, 3.0, 24.0)
            d = jnp.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
            ring = jnp.exp(-((d - r_px) ** 2) / (2.0 * 1.2 ** 2))
            vis = (rel[0] > 0.5).astype(jnp.float32)
            return jnp.clip(noise + vis * ring, 0.0, 1.0)

        def render_down_rgb(pos):
            # red landing pad, pinhole-projected (image x ~ world y,
            # image y ~ world x — the below-camera convention of ALIGN_PARK)
            alt = jnp.maximum(pos[2], 0.5)
            cx = W / 2 - f_down * (pad[1] - pos[1]) / alt
            cy = H / 2 - f_down * (pad[0] - pos[0]) / alt
            r_px = jnp.clip(f_down * pad_radius_m / alt, 3.0, 30.0)
            d = jnp.sqrt((ys - cx) ** 2 * 0 + (xs - cx) ** 2 + (ys - cy) ** 2)
            disk = (d < r_px).astype(jnp.float32)
            r_chan = jnp.clip(0.15 + 0.8 * disk, 0, 1)
            g_chan = jnp.full((H, W), 0.15)
            b_chan = jnp.full((H, W), 0.15)
            return jnp.stack([r_chan, g_chan, b_chan], -1)

        def render_down_gray(pos):
            # the marker fills the frame when hovering within 1.2 m of it
            d2 = jnp.linalg.norm(marker_xy - pos[:2], axis=1)
            which = jnp.argmin(d2)
            near = d2[which] < 1.2
            img = marker_imgs[which]  # render_marker is already [0, 1]
            Hm, Wm = img.shape
            pad_img = jnp.zeros((H, W)).at[:Hm, :Wm].set(img)
            return jnp.where(near, pad_img, noise), near

        def observe(pos):
            front = render_front(pos)
            ring = detect_rings(front[None], radii=radii, stride=1)
            down_rgb = render_down_rgb(pos)
            blob = detect_color_blob(down_rgb[None], channel=0,
                                     min_area=24)
            gray, near = render_down_gray(pos)
            det = decode_marker(gray[:88, :88][None])
            mid = jnp.where(det.found[0] & near, det.marker_id[0], -1)
            return Observation(
                ring_px=jnp.stack([ring.cx[0], ring.cy[0]]),
                ring_score=ring.score[0],
                blob_px=jnp.stack([blob.cx[0], blob.cy[0]]),
                blob_found=blob.found[0],
                altitude=pos[2], position=pos,
                marker_ids=jnp.stack([mid.astype(jnp.int32)]),
            )

        state, traj, phases = mission_rollout(
            cfg, observe, n_steps=1600, start=jnp.zeros(3), dt=0.1)
        phases = np.asarray(phases)
        traj = np.asarray(traj)

        for ph in (Phase.TAKEOFF, Phase.NAV_WAYPOINT, Phase.SEARCH_GATE,
                   Phase.ALIGN_GATE, Phase.PASS_GATE, Phase.ARUCO_SCAN,
                   Phase.PARK_SEARCH, Phase.ALIGN_PARK, Phase.DESCEND,
                   Phase.LANDED):
            assert (phases == int(ph)).any(), Phase(ph).name

        # BOTH gates crossed near their centers, on rendered pixels
        for gx, gy, gz in ((8.0, 0.8, 4.5), (16.0, -0.6, 4.2)):
            through = traj[np.abs(traj[:, 0] - gx) < 0.3]
            assert len(through) > 0, gx
            assert np.min(np.abs(through[:, 1] - gy)) < 0.5, gx
            assert np.min(np.abs(through[:, 2] - gz)) < 0.5, gx

        # both task markers decoded from rendered ArUco pixels
        assert bool(np.asarray(state.found_mask).all()), \
            np.asarray(state.found_mask)

        # landed on the pad, servoing on the detected red blob
        assert int(state.phase) == int(Phase.LANDED)
        final = traj[-1]
        assert abs(final[0] - 27.0) < 1.0, final
        assert abs(final[1] - 1.0) < 1.0, final
        assert final[2] <= 0.4, final
