"""Two-tier config machinery: flag files, C() scalars, model-YAML mapping."""

import numpy as np

from splatter_a_video_tpu.utils import config as cfg_lib


class TestScalarC:
    def test_plain_passthrough(self):
        assert cfg_lib.C(3) == 3.0
        assert cfg_lib.C(0.5, step=100) == 0.5

    def test_interpolated(self):
        v = [0, 1.0, 100, 3.0]
        assert cfg_lib.C(v, step=0) == 1.0
        assert cfg_lib.C(v, step=50) == 2.0
        assert cfg_lib.C(v, step=1000) == 3.0


class TestFlagFile:
    def test_parse_and_override(self, tmp_path):
        p = tmp_path / "config.txt"
        p.write_text("num_iters = 123\nloss_rgb_weight = 4.5  # comment\n")
        args = cfg_lib.parse_args(["--config", str(p)])
        assert args.num_iters == 123
        assert args.loss_rgb_weight == 4.5
        # CLI wins over the file
        args = cfg_lib.parse_args(["--config", str(p), "--num_iters", "7"])
        assert args.num_iters == 7


class TestApplyGsConfig:
    def test_shipped_yaml_maps_to_production_defaults(self):
        """configs/frag_gs_v10.yaml carries the reference production values,
        which are also our dataclass defaults — applying it must be a
        fixed point (plus the render-attributes switch)."""
        import os

        from splatter_a_video_tpu.train import fit, trainer

        root = os.path.join(os.path.dirname(__file__), "..")
        y = cfg_lib.load_yaml(os.path.join(root, "configs", "frag_gs_v10.yaml"))
        tcfg0 = trainer.TrainerConfig(width=64, height=48, num_frames=4)
        fcfg0 = fit.FitConfig()
        tcfg, fcfg = cfg_lib.apply_gs_config(y, tcfg0, fcfg0)
        assert tcfg.optim.lrs == tcfg0.optim.lrs
        assert tcfg.optim.schedules == tcfg0.optim.schedules
        assert tcfg.densify == tcfg0.densify
        assert tcfg.lambda_dssim == tcfg0.lambda_dssim
        assert tcfg.train_render_attributes  # render_attributes block present
        assert fcfg.render_attributes == (
            ("mask_attribute", 1), ("dino_attribute", 3),
        )  # pos_poly_feat is an existing trajectory param, not a new attr

    def test_overrides_apply(self):
        from splatter_a_video_tpu.train import fit, trainer

        y = {
            "trainer": {
                "max_steps": 555,
                "model": {"lambda_dssim": 0.3},
                "optimizer": {
                    "optimizer_1": {
                        "args": {"eps": 1e-12},
                        "extra_cfg": {
                            "min_opacity": 0.011,
                            "opacity_reset_interval": 1234,
                            "unknown_key": 9,
                        },
                        "params": {
                            "point_cloud.features": {"lr": 0.9},
                            "point_cloud.pos_cubic_node": {"lr": 0.8},
                        },
                    }
                },
                "scheduler": {
                    "params": {"point_cloud.position": {"init": 1.0, "final": 0.1}}
                },
                "dataset": {"white_bg": True},
            }
        }
        tcfg, fcfg = cfg_lib.apply_gs_config(
            y, trainer.TrainerConfig(width=64, height=48, num_frames=4),
            fit.FitConfig(),
        )
        assert tcfg.max_steps == 555 and tcfg.optim.max_steps == 555
        assert tcfg.lambda_dssim == 0.3
        assert tcfg.optim.eps == 1e-12
        assert tcfg.densify.min_opacity == 0.011
        assert tcfg.densify.opacity_reset_interval == 1234
        lrs = dict(tcfg.optim.lrs)
        assert lrs["features_dc"] == 0.9          # renamed param group
        assert lrs["pos_cubic_coeff"] == 0.8      # renamed param group
        assert dict(tcfg.optim.schedules)["position"] == (1.0, 0.1)
        assert tcfg.white_bg is True
        assert not tcfg.train_render_attributes  # no render_attributes block

    def test_parse_structured_ignores_unknown(self):
        import dataclasses

        @dataclasses.dataclass
        class D:
            a: int = 1
            b: float = 2.0

        d = cfg_lib.parse_structured(D, {"a": 5, "zzz": 9})
        assert d.a == 5 and d.b == 2.0

    def test_flag_file_list_values(self, tmp_path):
        """nargs flags in a flag file split into typed items."""
        p = tmp_path / "config.txt"
        p.write_text("dataset_weights = 0.8 0.2\ndataset_types = simpleGS+gaussian\n")
        args = cfg_lib.parse_args(["--config", str(p)])
        assert args.dataset_weights == [0.8, 0.2]
        assert args.dataset_types == "simpleGS+gaussian"
        args = cfg_lib.parse_args(
            ["--config", str(p), "--dataset_weights", "0.5", "0.5"]
        )
        assert args.dataset_weights == [0.5, 0.5]
