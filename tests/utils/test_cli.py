"""Tests for the shared CLI spec parsers (gradslam_tpu.utils.cli)."""

import pytest

from gradslam_tpu.utils import parse_pyramid


class TestParsePyramid:
    def test_none_passthrough(self):
        assert parse_pyramid(None) is None

    def test_two_levels(self):
        assert parse_pyramid("8:6,4:4") == [(8, 6), (4, 4)]

    def test_single_level(self):
        assert parse_pyramid("2:10") == [(2, 10)]

    def test_malformed_value_exits_cleanly(self):
        # CLI parser contract: readable SystemExit, not a raw ValueError
        # traceback (review r2 — online_slam's inline copy lacked this).
        with pytest.raises(SystemExit, match="Bad --pyramid spec"):
            parse_pyramid("8:a")

    def test_wrong_arity_exits_cleanly(self):
        with pytest.raises(SystemExit, match="dsratio:numiters"):
            parse_pyramid("8:6:2")
