"""Gating/block-size logic for the UNet's Pallas flash self-attention path.

The kernel itself is TPU-only (CPU runs keep the XLA lowering — asserted
here); its numerics are cross-checked against the XLA attention on-chip by
tools/bench_attn.py (max|diff| 1e-3 at the production shape).
"""
import jax

from voxe_tpu.models.sd.unet import _flash_block_sizes, _flash_self_attention_enabled


def test_disabled_on_cpu_backend():
    assert jax.default_backend() == "cpu"  # tests/conftest.py pins CPU
    assert not _flash_self_attention_enabled(4096, 64)


def test_gate_shape_rules(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _flash_self_attention_enabled(4096, 64)
    assert _flash_self_attention_enabled(2048, 128)
    assert not _flash_self_attention_enabled(1024, 64)  # 32^2 level: XLA wins
    assert not _flash_self_attention_enabled(4096, 512)  # VAE-style head dim
    assert not _flash_self_attention_enabled(2304, 64)  # not block-divisible
    monkeypatch.setenv("VOXE_FLASH_ATTN", "0")
    assert not _flash_self_attention_enabled(4096, 64)


def test_block_sizes_divide_sequence_lengths():
    for q_len in (2048, 4096, 8192, 2560, 9216):
        bs = _flash_block_sizes(q_len, q_len)
        assert q_len % bs.block_q == 0
        assert q_len % bs.block_k_major == 0
        assert q_len % bs.block_k == 0
        assert bs.block_k <= bs.block_k_major
        # the tuned production point (4096): q512 / k_major 2048 / k 1024
        if q_len == 4096:
            assert (bs.block_q, bs.block_k_major, bs.block_k) == (512, 2048, 1024)
