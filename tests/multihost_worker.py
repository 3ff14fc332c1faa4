"""Worker process for the two-process multi-host test.

Launched by ``tests/test_multihost.py`` with ``COORD``/``NPROC``/``PID`` in
the environment. Each process owns 2 virtual CPU devices (via XLA_FLAGS set
by the parent), joins the cluster through
``terran_tpu.parallel.initialize_multi_host`` — the real DCN entry point the
deployment docs prescribe — and then exercises the genuine multi-host data
path:

1. a global batch assembled with ``global_batch_from_local`` from
   per-process host shards (no cross-host host-side gather),
2. a jitted program containing cross-process collectives
   (``make_sharded_nms``: all_gather + psum spanning both processes),
3. per-host result extraction with ``local_results``.

Every process computes the single-device oracle locally (same seed) and
asserts the distributed result matches exactly, then prints ``MULTIHOST_OK``.
"""

import os
import sys

import jax

# The dev sandbox's sitecustomize imports jax pinned to the TPU platform;
# the config update (not the env var) is the reliable way to force CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terran_tpu.ops.nms import make_sharded_nms, nms_fixed  # noqa: E402
from terran_tpu.parallel import (  # noqa: E402
    create_mesh,
    global_batch_from_local,
    initialize_multi_host,
    local_results,
    shard_params,
)


def main():
    coord = os.environ["COORD"]
    nproc = int(os.environ["NPROC"])
    pid = int(os.environ["PID"])

    initialize_multi_host(coordinator_address=coord, num_processes=nproc,
                          process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = jax.local_device_count()
    assert n_global == nproc * n_local, (n_global, n_local)

    mesh = create_mesh()  # all global devices

    # --- Deterministic anchor candidates, identical on every process. ---
    rng = np.random.default_rng(7)
    n_anchors = 64  # sharded 16-per-device across the 4 global devices
    xy = rng.uniform(0, 80, size=(n_anchors, 2)).astype(np.float32)
    wh = rng.uniform(4, 24, size=(n_anchors, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0, 1, size=(n_anchors,)).astype(np.float32)

    # Each host feeds only its own slice, as per-host readers would.
    per_proc = n_anchors // nproc
    lo, hi = pid * per_proc, (pid + 1) * per_proc
    g_boxes = global_batch_from_local(boxes[lo:hi], mesh)
    g_scores = global_batch_from_local(scores[lo:hi], mesh)
    np.testing.assert_array_equal(local_results(g_boxes), boxes[lo:hi])

    # local_top_k equals the shard size and top_k the gathered size, so
    # neither stage can overflow and the keep-set is provably exact.
    sharded_nms = make_sharded_nms(mesh, iou_threshold=0.4,
                                   score_threshold=0.3, local_top_k=16,
                                   top_k=64)
    kb, ks, keep, order, overflow = sharded_nms(g_boxes, g_scores)

    # Oracle: exact greedy NMS on the full candidate set, single device.
    ob, os_, okeep, _, _ = nms_fixed(boxes, scores, 0.4,
                                     score_threshold=0.3, top_k=64)

    keep = local_results(keep)           # replicated -> full on every host
    ks = local_results(ks)
    kb = local_results(kb)
    np.testing.assert_array_equal(keep, np.asarray(okeep))
    np.testing.assert_allclose(np.asarray(ks)[keep], np.asarray(os_)[okeep],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(kb)[keep], np.asarray(ob)[okeep],
                               rtol=0, atol=0)
    assert not bool(overflow)

    # Replicated parameters land on every process's local devices.
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    placed = shard_params(params, mesh)
    assert len(placed["w"].sharding.device_set) == n_global
    np.testing.assert_array_equal(np.asarray(placed["w"]), params["w"])

    print(f"MULTIHOST_OK pid={pid} devices={n_global}", flush=True)


if __name__ == "__main__":
    main()
