"""Full-path pose decode parity: heatmaps+PAFs -> final keypoints.

The numpy oracle below implements the REFERENCE's complete decode semantics
(peak finding, per-limb line integrals, greedy matching with the shared
seen-set, incremental human assembly, filtering, keypoint extraction —
/root/reference/terran/pose/openpose/wrapper.py:226-483) independently of
the framework code. The framework path (device find_peaks + limb_scores,
host/native assemble_humans + get_keypoints) must produce identical
keypoint sets on random inputs. This is the glue-level guard the
stage-by-stage tests can't give: peak-id offsets, candidate ordering, count
limits, merge behaviour.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from terran_tpu.ops.pose_decode import (
    LIMBSEQ, MAP_IDX, NUM_LIMBS, NUM_PARTS, find_peaks, limb_scores,
)
from terran_tpu.pose.assembly import assemble_humans, get_keypoints


def reference_decode_numpy(heatmaps, pafs, keypoint_threshold=0.1,
                           thresh_2=0.05, human_threshold=0.4, scale=1.0):
    """Reference decode semantics (wrapper.py:226-483) in plain numpy."""
    num_midpoints = 10

    # Peaks per part, row-major, with global ids.
    num_peaks = 0
    peak_locs, peak_scores, peak_ids = [], [], []
    for part in range(NUM_PARTS):
        hm = heatmaps[..., part]
        interior = hm[1:-1, 1:-1]
        binary = (
            (interior >= hm[0:-2, 1:-1]) & (interior >= hm[1:-1, :-2])
            & (interior >= hm[2:, 1:-1]) & (interior >= hm[1:-1, 2:])
            & (interior >= keypoint_threshold)
        )
        locs = np.argwhere(binary) + 1
        peak_locs.append(locs)
        peak_scores.append(hm[locs[:, 0], locs[:, 1]])
        peak_ids.append(np.arange(num_peaks, num_peaks + len(locs)))
        num_peaks += len(locs)

    all_connections = []
    missing_limbs = []
    h = pafs.shape[0]
    for limb_id in range(NUM_LIMBS):
        cx, cy = MAP_IDX[limb_id]
        kpid_src, kpid_dst = LIMBSEQ[limb_id]
        loc_src = peak_locs[kpid_src].astype(np.float32)
        loc_dst = peak_locs[kpid_dst].astype(np.float32)
        if len(loc_src) == 0 or len(loc_dst) == 0:
            missing_limbs.append(limb_id)
            all_connections.append(np.zeros((0, 3)))
            continue

        diff = loc_dst[None, :, :] - loc_src[:, None, :]
        norms = np.linalg.norm(diff, axis=2)
        with np.errstate(divide="ignore", invalid="ignore"):
            dirs = diff / norms[..., None]

        # torch.linspace arithmetic: start + i * step in float32.
        steps = np.arange(num_midpoints, dtype=np.float32)
        step_size = diff / np.float32(num_midpoints - 1)
        seg = (
            loc_src[:, None, None, :]
            + step_size[:, :, None, :] * steps[None, None, :, None]
        ).astype(np.int64)
        seg_y = np.clip(seg[..., 0], 0, pafs.shape[0] - 1)
        seg_x = np.clip(seg[..., 1], 0, pafs.shape[1] - 1)

        mids = (
            pafs[seg_y, seg_x, cx] * dirs[..., 1][..., None]
            + pafs[seg_y, seg_x, cy] * dirs[..., 0][..., None]
        )  # (src, dst, M)
        with np.errstate(divide="ignore", invalid="ignore"):
            reg = mids.mean(axis=2) + np.minimum(0.5 * h / norms - 1.0, 0.0)
            crit1 = (mids > thresh_2).sum(axis=2) > 0.8 * num_midpoints
            crit2 = reg > 0
        matching = np.argwhere(
            crit1 & crit2 & (norms > 0) & np.isfinite(reg)
        )
        matching_scores = reg[matching[:, 0], matching[:, 1]]

        connections = []
        seen = set()
        for match in matching[np.argsort(-matching_scores)]:
            i, j = match
            if i not in seen and j not in seen:
                connections.append(
                    [peak_ids[kpid_src][i], peak_ids[kpid_dst][j], reg[i, j]]
                )
                if len(connections) >= min(len(loc_src), len(loc_dst)):
                    break
                seen.add(i)
                seen.add(j)
        all_connections.append(
            np.array(connections) if connections else np.zeros((0, 3))
        )

    peaks_by_id = np.array([
        tuple(p) + (sc,)
        for locs, scs in zip(peak_locs, peak_scores)
        for p, sc in zip(locs, scs)
    ]).reshape(-1, 3)

    humans = np.ones((0, 20)) * -1
    for limb_id in range(NUM_LIMBS):
        if limb_id in missing_limbs:
            continue
        conns = all_connections[limb_id]
        kpid_src, kpid_dst = LIMBSEQ[limb_id]
        for conn_idx in range(len(conns)):
            peak_src, peak_dst, score = conns[conn_idx]
            matched_with = [
                idx for idx, human in enumerate(humans)
                if human[kpid_src] == peak_src or human[kpid_dst] == peak_dst
            ]
            if len(matched_with) == 1:
                human = humans[matched_with[0]]
                if human[kpid_dst] != peak_dst:
                    human[kpid_dst] = peak_dst
                    human[-1] += 1
                    human[-2] += peaks_by_id[int(peak_dst), 2] + score
            elif len(matched_with) == 2:
                h1 = humans[matched_with[0]]
                h2 = humans[matched_with[1]]
                membership = ((h1 >= 0).astype(int) + (h2 >= 0).astype(int))[:-2]
                if not np.flatnonzero(membership == 2).size:
                    h1[:-2] += h2[:-2] + 1
                    h1[-2:] += h2[-2:]
                    h1[-2] += score
                    humans = np.delete(humans, matched_with[1], 0)
                else:
                    h1[kpid_dst] = peak_dst
                    h1[-1] += 1
                    h1[-2] += peaks_by_id[int(peak_dst), 2] + score
            elif not matched_with and limb_id < 17:
                human = np.ones(20) * -1
                human[kpid_src] = peak_src
                human[kpid_dst] = peak_dst
                human[-1] = 2
                human[-2] = (
                    peaks_by_id[int(peak_src), 2]
                    + peaks_by_id[int(peak_dst), 2] + score
                )
                humans = np.vstack([humans, human])

    keep = [
        idx for idx, human in enumerate(humans)
        if human[-1] >= 4 and human[-2] / human[-1] >= human_threshold
    ]
    humans = humans[keep]

    detections = []
    for human in humans:
        keypoints = np.zeros((18, 3), dtype=np.int32)
        for j in range(18):
            pid = int(human[j])
            if pid != -1:
                y, x = peaks_by_id[pid][:2]
                keypoints[j] = (np.int32(x / scale), np.int32(y / scale), 1)
        detections.append(
            {"keypoints": keypoints, "score": human[-2] / human[-1]}
        )
    return detections


def framework_decode(heatmaps, pafs, max_peaks=64, scale=1.0,
                     use_native=None):
    coords, scores, valid, _ = find_peaks(
        jnp.asarray(heatmaps[..., :NUM_PARTS]), 0.1, max_peaks
    )
    reg, accept = limb_scores(jnp.asarray(pafs), coords, valid, 0.05)
    peaks_by_id, humans = assemble_humans(
        *map(np.asarray, (coords, scores, valid, reg, accept)),
        use_native=use_native,
    )
    return get_keypoints(peaks_by_id, humans, scale=scale)


def _sorted_people(dets):
    return sorted(
        (tuple(map(tuple, d["keypoints"])), round(float(d["score"]), 4))
        for d in dets
    )


@pytest.mark.parametrize("use_native", [False, None])
def test_full_decode_parity_random_fields(use_native, rng):
    """Random smooth heatmaps/PAFs decode to identical final keypoints."""
    from scipy.ndimage import gaussian_filter

    mismatched = 0
    for trial in range(6):
        h, w = 64, 80
        heat = gaussian_filter(
            rng.normal(scale=1.0, size=(h, w, 19)).astype(np.float32),
            sigma=(4, 4, 0),
        ) * 4.0
        pafs = gaussian_filter(
            rng.normal(scale=1.0, size=(h, w, 38)).astype(np.float32),
            sigma=(6, 6, 0),
        ) * 6.0

        expected = reference_decode_numpy(heat, pafs, scale=0.5)
        got = framework_decode(heat, pafs, scale=0.5, use_native=use_native)
        assert _sorted_people(got) == _sorted_people(expected), trial
