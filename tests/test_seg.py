"""Native segmentation backend tests: maxflow min-cut + connected components."""
import numpy as np
import pytest

from voxe_tpu.seg.native import largest_k, maxflow_mincut


@pytest.mark.parametrize("algo", ["dinic", "bk"])
def test_maxflow_two_cluster_cut(algo):
    # 4-node chain: 0-1-2-3 with a weak middle edge; node 0 seeded edit,
    # node 3 seeded object -> cut at the weak edge
    edge_u = np.array([0, 1, 2], dtype=np.int32)
    edge_v = np.array([1, 2, 3], dtype=np.int32)
    caps = np.array([10.0, 0.1, 10.0], dtype=np.float32)
    cap_src = np.array([1e30, 0, 0, 0], dtype=np.float32)
    cap_snk = np.array([0, 0, 0, 1e30], dtype=np.float32)
    flow, labels = maxflow_mincut(
        4, edge_u, edge_v, caps, caps, cap_src, cap_snk, algo=algo
    )
    assert flow == pytest.approx(0.1, rel=1e-5)
    np.testing.assert_array_equal(labels, [0, 0, 1, 1])


@pytest.mark.parametrize("algo", ["dinic", "bk"])
def test_maxflow_respects_capacity_ratio(algo):
    # diamond: source side pulls both middles unless sink edges dominate
    edge_u = np.array([0, 0, 1, 2], dtype=np.int32)
    edge_v = np.array([1, 2, 3, 3], dtype=np.int32)
    caps = np.array([5.0, 1.0, 1.0, 5.0], dtype=np.float32)
    cap_src = np.array([1e30, 0, 0, 0], dtype=np.float32)
    cap_snk = np.array([0, 0, 0, 1e30], dtype=np.float32)
    flow, labels = maxflow_mincut(
        4, edge_u, edge_v, caps, caps, cap_src, cap_snk, algo=algo
    )
    assert flow == pytest.approx(2.0, rel=1e-5)
    assert labels[0] == 0 and labels[3] == 1
    assert labels[1] == 0  # strong source link, weak sink link
    assert labels[2] == 1  # weak source link, strong sink link


def _cut_capacity(labels, edge_u, edge_v, cap, cap_rev, cap_src, cap_snk):
    """Capacity of the (source-side, sink-side) cut induced by labels."""
    lu, lv = labels[edge_u], labels[edge_v]
    forward = cap[(lu == 0) & (lv == 1)].sum()  # u on source side -> v on sink
    backward = cap_rev[(lu == 1) & (lv == 0)].sum()  # v->u crossing edges
    terminals = cap_snk[labels == 0].sum() + cap_src[labels == 1].sum()
    return float(forward + backward + terminals)


def test_bk_matches_dinic_on_random_grid_graphs():
    """BK and Dinic agree on the (unique) max-flow value, and each label set
    is a valid min cut (cut capacity == flow, the max-flow/min-cut duality),
    across randomized 3D 6-connected grid graphs shaped like the production
    segmentation problem (graphcut.py:160-167)."""
    rng = np.random.default_rng(7)
    for trial in range(8):
        n_side = int(rng.integers(3, 7))
        shape = (n_side, n_side, n_side)
        n = int(np.prod(shape))
        node = np.arange(n).reshape(shape)
        us, vs = [], []
        for axis in range(3):
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[axis] = slice(None, -1)
            sl_hi[axis] = slice(1, None)
            us.append(node[tuple(sl_lo)].ravel())
            vs.append(node[tuple(sl_hi)].ravel())
        edge_u = np.concatenate(us).astype(np.int32)
        edge_v = np.concatenate(vs).astype(np.int32)
        m = len(edge_u)
        cap = rng.random(m).astype(np.float32)
        cap_rev = rng.random(m).astype(np.float32)
        cap_src = np.where(rng.random(n) < 0.2, rng.random(n) * 3, 0).astype(np.float32)
        cap_snk = np.where(rng.random(n) < 0.2, rng.random(n) * 3, 0).astype(np.float32)

        flow_d, labels_d = maxflow_mincut(
            n, edge_u, edge_v, cap, cap_rev, cap_src, cap_snk, algo="dinic"
        )
        flow_b, labels_b = maxflow_mincut(
            n, edge_u, edge_v, cap, cap_rev, cap_src, cap_snk, algo="bk"
        )
        assert flow_b == pytest.approx(flow_d, rel=1e-5, abs=1e-6), f"trial {trial}"
        for labels in (labels_d, labels_b):
            cut = _cut_capacity(
                labels, edge_u, edge_v, cap, cap_rev, cap_src, cap_snk
            )
            assert cut == pytest.approx(flow_d, rel=1e-4, abs=1e-5), f"trial {trial}"


def test_largest_k_two_blobs():
    vol = np.zeros((10, 10, 10), dtype=np.uint8)
    vol[0:4, 0:4, 0:4] = 1  # 64 voxels (largest)
    vol[7:9, 7:9, 7:9] = 1  # 8 voxels
    labels, n = largest_k(vol, k=10, connectivity=26)
    assert n == 2
    assert labels[1, 1, 1] == 10  # largest gets label k
    assert labels[8, 8, 8] == 9  # second largest gets k-1
    assert labels[5, 5, 5] == 0


def test_largest_k_diagonal_connectivity():
    vol = np.zeros((4, 4, 4), dtype=np.uint8)
    vol[0, 0, 0] = 1
    vol[1, 1, 1] = 1  # diagonal neighbor: connected under 26, not under 6
    labels26, n26 = largest_k(vol, k=3, connectivity=26)
    labels6, n6 = largest_k(vol, k=3, connectivity=6)
    assert n26 == 1 and n6 == 2


def test_scc_post_process_reverts_satellites():
    from voxe_tpu.seg.components import scc_post_process

    densities = np.full((8, 8, 8, 1), -5.0, dtype=np.float32)
    ref = np.full_like(densities, -7.0)
    densities[0:4, 0:4, 0:4] = 3.0  # main blob (kept)
    densities[6:8, 6:8, 6:8] = 2.0  # satellite (reverted to ref)
    out = scc_post_process(densities, ref)
    assert (out[0:4, 0:4, 0:4] == 3.0).all()
    assert (out[6:8, 6:8, 6:8] == -7.0).all()
    assert (out[4:6] == -7.0).all()  # empty space also reverted to ref


def test_graphcut_segments_attn_blobs():
    """Two spatial blobs with opposite attn logits -> clean segmentation."""
    import jax.numpy as jnp

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.seg.graphcut import get_edit_region
    from voxe_tpu.utils.camera import CameraBounds

    res = 12
    densities = np.full((res, res, res, 1), -1.0, dtype=np.float32)
    densities[2:5, 2:5, 2:5] = 5.0  # blob A (edit)
    densities[7:10, 7:10, 7:10] = 5.0  # blob B (object)
    features = np.zeros((res, res, res, 3), dtype=np.float32)
    features[7:10, 7:10, 7:10] = 3.0  # colour difference between blobs
    edit_attn = np.full((res, res, res, 1), -20.0, dtype=np.float32)
    obj_attn = np.full((res, res, res, 1), -20.0, dtype=np.float32)
    edit_attn[2:5, 2:5, 2:5] = 2.0
    obj_attn[7:10, 7:10, 7:10] = 2.0

    def mk(attn):
        grid = VoxelGrid(
            jnp.asarray(densities), jnp.asarray(features), VoxelGridConfig(),
            attn=jnp.asarray(attn),
        )
        return VolumetricModel(
            grid,
            SHVoxGridRenderConfig(num_samples_per_ray=8, camera_bounds=CameraBounds(2.0, 6.0)),
        )

    vm_edit, vm_obj, vm_out = mk(edit_attn), mk(obj_attn), mk(edit_attn)
    segments, idxs = get_edit_region(
        vm_edit, vm_obj, vm_out,
        num_obj_voxels_thresh=50, min_num_edit_voxels=5,
    )

    keep = np.asarray(vm_out.grid.attn)
    # edit blob voxels -> 0; object blob voxels -> -5; empty space -> -10
    assert (keep[3, 3, 3] == 0.0).all()
    assert (keep[8, 8, 8] == -5.0).all()
    assert (keep[0, 0, 0] == -10.0).all()


def test_unreached_nodes_default_to_source_side():
    """Nodes disconnected from BOTH terminals after the cut must label 0
    (SOURCE/edit) — PyMaxflow's what_segment default, which the reference
    pipeline relies on (refinement_functions.py:293). Regression: BK labeled
    free nodes as object; Dinic labeled by source-reachability (same bug)."""
    import numpy as np

    from voxe_tpu.seg.native import maxflow_mincut

    empty = np.zeros(0, np.float32)
    cap_src = np.array([1e30, 0.0, 0.0], np.float32)
    cap_snk = np.array([0.0, 1e30, 0.0], np.float32)
    for algo in ("bk", "dinic"):
        flow, labels = maxflow_mincut(
            3, np.zeros(0, np.int32), np.zeros(0, np.int32), empty, empty,
            cap_src, cap_snk, algo=algo,
        )
        assert labels[0] == 0, algo   # source-seeded
        assert labels[1] == 1, algo   # sink-seeded
        assert labels[2] == 0, algo   # free -> SOURCE default
        assert flow == 0.0, algo


def test_graphcut_downsampled_real_scene_shape():
    """--downsample_refine_grid, the real-scene recipe flag (reference
    edit_demo_real.sh:36, refinement_functions.py:362-405): the x4-pooled cut
    on a NON-CUBIC grid must write a FULL-resolution keep grid with the blobs
    still segmented (edit block -> 0, object block -> -5, empty -> -10)."""
    import jax.numpy as jnp

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.seg.graphcut import get_edit_region
    from voxe_tpu.utils.camera import CameraBounds

    dims = (16, 12, 20)  # non-cubic, divisible by the x4 pooling
    densities = np.full((*dims, 1), -1.0, dtype=np.float32)
    densities[0:8, 0:8, 0:8] = 5.0  # blob A (edit)
    densities[8:16, 4:12, 12:20] = 5.0  # blob B (object)
    features = np.zeros((*dims, 3), dtype=np.float32)
    features[8:16, 4:12, 12:20] = 3.0
    edit_attn = np.full((*dims, 1), -20.0, dtype=np.float32)
    obj_attn = np.full((*dims, 1), -20.0, dtype=np.float32)
    edit_attn[0:8, 0:8, 0:8] = 2.0
    obj_attn[8:16, 4:12, 12:20] = 2.0

    def mk(attn):
        grid = VoxelGrid(
            jnp.asarray(densities), jnp.asarray(features), VoxelGridConfig(),
            attn=jnp.asarray(attn),
        )
        return VolumetricModel(
            grid,
            SHVoxGridRenderConfig(
                num_samples_per_ray=8, camera_bounds=CameraBounds(2.0, 6.0)
            ),
        )

    vm_edit, vm_obj, vm_out = mk(edit_attn), mk(obj_attn), mk(edit_attn)
    segments, idxs = get_edit_region(
        vm_edit, vm_obj, vm_out,
        downsample_grid=True, downsample_factor=4,
        num_obj_voxels_thresh=50, min_num_edit_voxels=2,
        top_k_edit_thresh=2, top_k_obj_thresh=2,
    )

    keep = np.asarray(vm_out.grid.attn)
    assert keep.shape == (*dims, 1)  # FULL resolution, not the pooled one
    assert (keep[2, 2, 2] == 0.0).all()  # edit blob interior
    assert (keep[12, 8, 16] == -5.0).all()  # object blob interior
    assert (keep[0, 0, 19] == -10.0).all()  # empty corner
    # the pooled cut ran at 4x4x5 nodes, not the full 16x12x20
    assert idxs.max() < max(dims) // 4 + 1
