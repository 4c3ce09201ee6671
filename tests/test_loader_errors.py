"""Loader failure propagation + DeepZoom math unit tests."""

import numpy as np
import pytest

from digipathai_tpu.engine.loader import PatchLoader
from digipathai_tpu.engine.planner import plan_patches
from digipathai_tpu.io.deepzoom import DeepZoomGenerator
from digipathai_tpu.io.slide import Slide


class TestLoaderErrors:
    def test_read_failure_propagates(self, tmp_path):
        from tests.fixtures import make_synthetic_slide

        p = str(tmp_path / "err-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=61)
        with Slide(p) as s:
            plan = plan_patches(s, patch=128, stride=128, batch=4, supertile=512)

            class Boom(Exception):
                pass

            class BrokenSlide:
                def read_region(self, *a, **k):
                    raise Boom("disk died")

            loader = PatchLoader(BrokenSlide(), plan, num_workers=2)
            with pytest.raises(Boom):
                for _ in loader:
                    pass

    def test_skip_all_groups_yields_nothing(self, tmp_path):
        from tests.fixtures import make_synthetic_slide

        p = str(tmp_path / "skip-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=62)
        with Slide(p) as s:
            plan = plan_patches(s, patch=128, stride=128, batch=4, supertile=512)
            loader = PatchLoader(s, plan, num_workers=2,
                                 skip_groups=set(range(len(plan.groups))))
            assert list(loader) == []


class TestDeepZoomMath:
    @pytest.fixture()
    def dz(self, tmp_path):
        from tests.fixtures import make_synthetic_slide

        p = str(tmp_path / "dz-slide.tiff")
        make_synthetic_slide(p, 1000, 600, seed=63)
        return DeepZoomGenerator(Slide(p), tile_size=254, overlap=1)

    def test_level_count_and_dims(self, dz):
        # ceil(log2(1000)) = 10 -> 11 levels (1x1 .. 1000x600)
        assert dz.level_count == 11
        assert dz.level_dimensions[-1] == (1000, 600)
        assert dz.level_dimensions[0] == (1, 1)
        # halving chain with ceil
        assert dz.level_dimensions[-2] == (500, 300)
        assert dz.level_tiles[-1] == (4, 3)

    def test_dzi_xml(self, dz):
        xml = dz.get_dzi("jpeg")
        assert 'TileSize="254"' in xml and 'Overlap="1"' in xml
        assert 'Width="1000"' in xml and 'Height="600"' in xml

    def test_edge_tile_sizes(self, dz):
        # interior tile: 254 + overlap on both sides where applicable
        t = dz.get_tile(10, (0, 0))
        assert t.size == (255, 255)  # +1 overlap right/bottom only
        t = dz.get_tile(10, (3, 2))  # last col/row
        assert t.size == (1000 - 3 * 254 + 1, 600 - 2 * 254 + 1)

    def test_invalid_addresses(self, dz):
        with pytest.raises(ValueError):
            dz.get_tile(99, (0, 0))
        with pytest.raises(ValueError):
            dz.get_tile(10, (99, 0))
