"""Config system tests: dotted replace composition and preset defaults."""
import pytest

from cmax_slam_tpu.config import (
    SystemConfig, ijrr_config, live_davis_config, replace,
)


def test_replace_dotted_keys_share_prefix_compose():
    # Regression: two dotted keys under the same head used to clobber each
    # other (the second sub-replace started from the ORIGINAL subtree).
    cfg = replace(
        ijrr_config(),
        **{
            "backend.pano_map.pano_height": 256,
            "backend.pano_map.pano_width": 512,
            "backend.trajectory.spline_degree": 3,
        },
    )
    assert cfg.backend.pano_map.pano_height == 256
    assert cfg.backend.pano_map.pano_width == 512
    assert cfg.backend.trajectory.spline_degree == 3


def test_replace_direct_and_dotted_conflict_raises():
    cfg = ijrr_config()
    with pytest.raises(ValueError, match="conflicting"):
        replace(cfg, **{"backend": cfg.backend, "backend.gamma": 0.5})


def test_replace_unknown_key_raises():
    with pytest.raises(TypeError):
        replace(ijrr_config(), **{"backend.nonexistent_knob": 1})


def test_bootstrap_resolve_default_on_in_presets():
    # The stock presets must carry the north-star accuracy configuration
    # (VERDICT r4 item 3): bootstrap re-solve defaults ON...
    assert SystemConfig().backend.bootstrap_resolve_window == 4
    assert ijrr_config().backend.bootstrap_resolve_window == 4
    # ...except live mode, which keeps the reference's never-revisit
    # protocol to avoid a latency spike at tracking start.
    assert live_davis_config().backend.bootstrap_resolve_window is None


def test_presets_hashable_as_jit_statics():
    for cfg in (ijrr_config(), live_davis_config()):
        hash(cfg)
