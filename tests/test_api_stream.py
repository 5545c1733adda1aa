"""predict_stream (double-buffered serving loop) == sequential predict.

The stream path must be a pure reordering of host<->device synchronization:
identical compiled graph, identical postprocessing, identical results —
only the overlap of prepare/paste with device compute differs.
"""

import numpy as np
import pytest

from mask_rcnn_tpu.models.api import MaskRCNNResNet
from mask_rcnn_tpu.models.mask_rcnn import init_params
from tests.test_model import tiny_config


@pytest.fixture(scope="module")
def tiny_api_model():
    import jax

    cfg = tiny_config()
    model = MaskRCNNResNet.from_config(
        cfg, init_params(jax.random.PRNGKey(0), cfg)
    )
    model.score_thresh = 0.0  # keep every padded detection comparable
    return model


def _rand_batches(seed, n_batches, batch_size):
    rng = np.random.RandomState(seed)
    return [
        [
            rng.randint(0, 255, (3, 64 + 8 * (b % 3), 96)).astype(np.float32)
            for _ in range(batch_size)
        ]
        for b in range(n_batches)
    ]


@pytest.mark.parametrize(
    "depth",
    [1,
     pytest.param(2, marks=pytest.mark.medium),
     pytest.param(3, marks=pytest.mark.medium),
     8],
)
def test_predict_stream_matches_predict(tiny_api_model, depth):
    model = tiny_api_model
    batches = _rand_batches(0, n_batches=4, batch_size=2)

    sequential = [model.predict(imgs) for imgs in batches]
    streamed = list(model.predict_stream(iter(batches), depth=depth))

    assert len(streamed) == len(sequential)
    for seq, st in zip(sequential, streamed):
        for a_list, b_list in zip(seq, st):
            assert len(a_list) == len(b_list)
            for a, b in zip(a_list, b_list):
                np.testing.assert_array_equal(a, b)


def test_predict_stream_rejects_bad_depth(tiny_api_model):
    with pytest.raises(ValueError):
        list(tiny_api_model.predict_stream(iter([]), depth=0))


def test_predict_stream_empty(tiny_api_model):
    assert list(tiny_api_model.predict_stream(iter([]))) == []
