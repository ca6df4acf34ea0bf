"""KModes multi-restart (kmodes.pas:949-966, 1046-1053): golden-ratio
starting points, best-of-N selection, and the EncoderConfig.kmodes_restarts
wiring through GlobalTiling."""
import numpy as np

from tiler_tpu.ops import kmodes as km


def test_golden_starts_properties():
    for n, r in [(1000, 7), (50, 7), (8, 3), (4096, 5), (7, 7)]:
        sps = km.golden_ratio_starts(n, r)
        assert len(sps) == r
        assert sps[0] == 0  # Round(1) - 1
        assert all(0 <= s < n for s in sps)
        assert all(b > a for a, b in zip(sps, sps[1:]))  # strictly increasing


def test_golden_starts_spread_values():
    # n=1000, r=7: acc = 1, 2.68, 7.20, 19.3, 51.8, 139, 373 (float32)
    assert km.golden_ratio_starts(1000, 7) == [0, 2, 6, 18, 51, 138, 372]


def test_restart_cost_is_min_over_single_starts(rng):
    x = rng.integers(0, 16, (300, 80)).astype(np.uint8)
    k = 10
    singles = []
    for s in km.golden_ratio_starts(len(x), 5):
        _, _, cost = km.kmodes(x, k, s, 16, return_cost=True)
        singles.append(cost)
    _, _, multi_cost = km.kmodes(x, k, -5, 16, return_cost=True)
    assert multi_cost == min(singles)
    assert all(multi_cost <= c for c in singles)


def test_batch_gather_restarts_match_single_path(rng):
    import jax.numpy as jnp
    from tiler_tpu.pipeline.global_tiling import tile_signatures

    tiles = rng.integers(0, 16, (200, 8, 8)).astype(np.uint8)
    sigs = tile_signatures(tiles, 16)
    sel = np.arange(len(sigs), dtype=np.int32)
    out = km.kmodes_batch_gather(jnp.asarray(sigs), [sel], [12], [-4], 16)
    labels_g, _, _ = out[0]
    labels_s, _ = km.kmodes(sigs, 12, -4, 16)
    np.testing.assert_array_equal(np.asarray(labels_g, np.int32), labels_s)


def test_batch_restarts_match_gather(rng):
    import jax.numpy as jnp
    from tiler_tpu.pipeline.global_tiling import tile_signatures

    tiles = rng.integers(0, 16, (150, 8, 8)).astype(np.uint8)
    sigs = tile_signatures(tiles, 16)
    sel = np.arange(len(sigs), dtype=np.int32)
    got_b = km.kmodes_batch([sigs], [9], [-3], 16)[0][0]
    got_g = km.kmodes_batch_gather(jnp.asarray(sigs), [sel], [9], [-3],
                                   16)[0][0]
    np.testing.assert_array_equal(got_b, np.asarray(got_g, np.int32))


def test_encoder_restarts_config_end_to_end(rng):
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder

    frames = rng.integers(0, 255, (4, 64, 96, 3)).astype(np.uint8)
    cfg = EncoderConfig(palette_count=8, tile_palette_size=16,
                        kmodes_restarts=2, max_tiles=60)
    blob = Encoder(cfg).run_all(frames, fps=24.0)
    dec, _ = decode_video(blob)
    assert dec.shape == (4, 64, 96, 3)
    # restarts can only improve (or match) the clustering objective; the
    # stream must still decode and differ structurally only via tile choice
    cfg0 = EncoderConfig(palette_count=8, tile_palette_size=16,
                         kmodes_restarts=0, max_tiles=60)
    blob0 = Encoder(cfg0).run_all(frames, fps=24.0)
    dec0, _ = decode_video(blob0)
    assert dec0.shape == dec.shape
