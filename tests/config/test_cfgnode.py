import pytest
import yaml

from gradslam_tpu.config import CfgNode, load_cfg


def base_cfg():
    return CfgNode(
        {
            "SLAM": {"odom": "gradicp", "dsratio": 4},
            "DATA": {"height": 480, "width": 640, "sequences": ["a", "b"]},
        }
    )


class TestCfgNode:
    def test_attribute_access(self):
        cfg = base_cfg()
        assert cfg.SLAM.odom == "gradicp"
        assert cfg.DATA.height == 480

    def test_set_attribute(self):
        cfg = base_cfg()
        cfg.SLAM.odom = "icp"
        assert cfg.SLAM.odom == "icp"

    def test_freeze(self):
        cfg = base_cfg()
        cfg.freeze()
        with pytest.raises(AttributeError):
            cfg.SLAM.odom = "icp"
        cfg.defrost()
        cfg.SLAM.odom = "icp"

    def test_merge_from_other_cfg(self):
        cfg = base_cfg()
        other = CfgNode({"SLAM": {"odom": "gt"}})
        cfg.merge_from_other_cfg(other)
        assert cfg.SLAM.odom == "gt"
        assert cfg.SLAM.dsratio == 4

    def test_merge_from_list(self):
        cfg = base_cfg()
        cfg.merge_from_list(["SLAM.dsratio", "8", "DATA.height", "240"])
        assert cfg.SLAM.dsratio == 8
        assert cfg.DATA.height == 240

    def test_merge_nonexistent_key_raises(self):
        cfg = base_cfg()
        with pytest.raises(KeyError):
            cfg.merge_from_other_cfg(CfgNode({"BOGUS": 1}))

    def test_new_allowed(self):
        cfg = CfgNode({"A": 1}, new_allowed=True)
        cfg.merge_from_other_cfg(CfgNode({"B": 2}))
        assert cfg.B == 2

    def test_type_coercion_list_tuple(self):
        cfg = base_cfg()
        cfg.merge_from_other_cfg(CfgNode({"DATA": {"sequences": ["c"]}}))
        assert cfg.DATA.sequences == ["c"]

    def test_type_mismatch_raises(self):
        cfg = base_cfg()
        with pytest.raises(ValueError):
            cfg.merge_from_other_cfg(CfgNode({"DATA": {"height": "tall"}}))

    def test_dump_roundtrip(self):
        cfg = base_cfg()
        dumped = cfg.dump()
        reloaded = CfgNode(yaml.safe_load(dumped))
        assert reloaded.SLAM.odom == cfg.SLAM.odom

    def test_load_cfg_from_yaml_str(self):
        cfg = load_cfg("SLAM:\n  odom: icp\n")
        assert cfg.SLAM.odom == "icp"

    def test_merge_from_file(self, tmp_path):
        f = tmp_path / "cfg.yaml"
        f.write_text("SLAM:\n  odom: gt\n")
        cfg = base_cfg()
        cfg.merge_from_file(str(f))
        assert cfg.SLAM.odom == "gt"

    def test_deprecated_key_skipped(self):
        cfg = base_cfg()
        cfg.register_deprecated_key("OLD.KEY")
        cfg.merge_from_list(["OLD.KEY", "1"])  # no error

    def test_renamed_key_raises(self):
        cfg = base_cfg()
        cfg.register_renamed_key("OLD.NAME", "SLAM.odom")
        with pytest.raises(KeyError):
            cfg.merge_from_list(["OLD.NAME", "icp"])

    def test_clone_independent(self):
        cfg = base_cfg()
        c2 = cfg.clone()
        c2.SLAM.odom = "icp"
        assert cfg.SLAM.odom == "gradicp"


class TestLoadCfgPyModule:
    def test_load_from_python_file(self, tmp_path):
        f = tmp_path / "mycfg.py"
        f.write_text("cfg = {'SLAM': {'odom': 'icp', 'dsratio': 2}}\n")
        with open(str(f)) as fh:
            cfg = load_cfg(fh)
        assert cfg.SLAM.odom == "icp"
        assert cfg.SLAM.dsratio == 2

    def test_py_module_without_cfg_raises(self, tmp_path):
        f = tmp_path / "bad.py"
        f.write_text("not_cfg = 1\n")
        with pytest.raises(AssertionError):
            with open(str(f)) as fh:
                load_cfg(fh)
