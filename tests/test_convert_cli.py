"""Weight-conversion CLI: synthetic .pt -> Orbax checkpoint on disk."""

import numpy as np
import pytest
import torch

from s2tpu.data.pipeline import prefetch_to_device


def test_convert_prithvi_cli(tmp_path, monkeypatch):
    from s2tpu.models.prithvi_mae import PrithviConfig
    from tests.test_convert import synthetic_prithvi_state_dict
    import s2tpu.cli.convert_weights as cw
    import s2tpu.utils as utils

    tiny = PrithviConfig(
        img_size=32, patch_size=8, num_frames=2, tubelet_size=1, in_chans=6,
        embed_dim=64, depth=2, num_heads=4, decoder_embed_dim=48, decoder_depth=1,
        decoder_num_heads=4,
    )
    sd = synthetic_prithvi_state_dict(tiny)
    pt_path = tmp_path / "prithvi_tiny.pt"
    torch.save(sd, pt_path)

    # point the CLI's architecture-config loader at the tiny config
    monkeypatch.setattr(
        cw, "load_prithvi_model_args",
        lambda num_frames=None: {
            "img_size": 32, "patch_size": 8, "num_frames": 2, "tubelet_size": 1,
            "in_chans": 6, "embed_dim": 64, "depth": 2, "num_heads": 4,
            "decoder_embed_dim": 48, "decoder_depth": 1, "decoder_num_heads": 4,
        },
    )
    out = tmp_path / "flax_ckpt"
    cw.main(["prithvi", str(pt_path), "--out", str(out), "--num-frames", "2"])
    assert out.exists()

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(out.resolve())
    np.testing.assert_allclose(
        restored["cls_token"], sd["cls_token"].numpy(), rtol=1e-6
    )
    assert "block_0" in restored and "decoder_block_0" in restored


def test_prefetch_propagates_producer_error():
    def bad_iterator():
        yield from []
        raise RuntimeError("unreachable")

    def failing_iterator():
        def gen():
            yield np.zeros(1)
            raise RuntimeError("disk died")

        return gen()

    from s2tpu.data.pipeline import HostBatch

    def batches():
        yield HostBatch(np.zeros((1, 4, 4, 2), np.int16), np.zeros((1, 4, 4), np.int32), np.ones(1, bool))
        raise RuntimeError("disk died")

    it = prefetch_to_device(batches(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="disk died"):
        next(it)
