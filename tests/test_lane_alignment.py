"""The lane-aligned default base lattice (TPU layout: lanes of 128).

A base width V that is not a multiple of 128 makes every [S, U, V] ->
[S, U*V] flatten in the streamed shear-warp compositing a physical retile
(~5.7 ms/iter of "data formatting" in the dog2 render backward, r4 trace);
at V % 128 == 0 the flatten is a free bitcast (SDS edit step measured
56.5 -> 52.8 ms/iter at base 400 -> 384). The trainers round their DEFAULT
base to the nearest multiple of 128 when within 10%; an explicit
--shear_warp_base_res is honored exactly.
"""
from voxe_tpu.render.shearwarp import lane_aligned_res


def test_lane_aligned_res_values():
    # the flagship case: dog2 400^2 frames -> 384 base
    assert lane_aligned_res(400) == 384
    # recon default 2x image res for 400^2 data
    assert lane_aligned_res(800) == 768
    # already aligned: unchanged
    assert lane_aligned_res(384) == 384
    assert lane_aligned_res(512) == 512
    assert lane_aligned_res(128) == 128
    # nearest multiple too far (>10%): unchanged
    assert lane_aligned_res(200) == 200
    assert lane_aligned_res(160) == 160
    # tiny test configs must never be inflated to 128
    assert lane_aligned_res(64) == 64
    assert lane_aligned_res(32) == 32
    # rounding up is allowed when within tolerance
    assert lane_aligned_res(120) == 128
    assert lane_aligned_res(480) == 512


def test_trainer_defaults_use_alignment():
    """The three trainer default sites compute lane_aligned_res of the
    image-derived base; explicit overrides stay exact (source contract)."""
    import inspect

    import voxe_tpu.train.recon as recon
    import voxe_tpu.train.refine as refine
    import voxe_tpu.train.sds as sds

    for mod in (sds, refine, recon):
        src = inspect.getsource(mod)
        assert "lane_aligned_res" in src, mod.__name__
