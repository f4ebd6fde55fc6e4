"""Every dev_script must be shell-valid and use only flags our options
parser knows — the scripts ARE the reference-compatible user surface
(SURVEY §5 Config), so an unknown flag means a silent config drop."""
import glob
import os
import re
import subprocess

import pytest

from sgnerf_tpu.options.options import TrainOptions

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "dev_scripts", "**", "*.sh"),
                           recursive=True))

# flags consumed by run/*.py directly rather than the options parser
EXTRA_OK = set()


def _known_flags():
    parser = TrainOptions().parser
    return {s for s in parser._option_string_actions if s.startswith("--")}


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.relpath(s, os.path.join(
                             REPO, "dev_scripts")) for s in SCRIPTS])
def test_dev_script_flags_are_known(script):
    assert subprocess.run(["bash", "-n", script]).returncode == 0
    text = open(script).read()
    known = _known_flags() | EXTRA_OK
    used = set(re.findall(r"(?<!\w)--([A-Za-z_][A-Za-z0-9_]*)", text))
    unknown = {f for f in used if f"--{f}" not in known}
    assert not unknown, (f"{os.path.basename(script)} uses flags the parser "
                         f"does not define: {sorted(unknown)}")


def test_scripts_reference_existing_entry_points():
    for script in SCRIPTS:
        for m in re.finditer(r"python3? (run/\w+\.py)", open(script).read()):
            assert os.path.exists(os.path.join(REPO, m.group(1))), \
                f"{script}: missing entry point {m.group(1)}"


def test_attr_dedup_flag_threads_to_render_config():
    """--attr_dedup: -1 resolves per-backend (0 on CPU), explicit values
    pass through, and gvjp_U/attr_tile thread into RenderConfig."""
    from sgnerf_tpu.options.options import configs_from_opt

    opt = TrainOptions().parse(["--name", "t"])
    cfg, _, _ = configs_from_opt(opt)
    assert cfg.attr_dedup == 0          # auto on CPU = plain gather

    opt = TrainOptions().parse(
        ["--name", "t", "--attr_dedup", "256", "--attr_tile", "32",
         "--gvjp_U", "96", "--gather_vjp", "raydedup"])
    cfg, _, _ = configs_from_opt(opt)
    assert cfg.attr_dedup == 256 and cfg.attr_tile == 32
    assert cfg.gvjp_U == 96 and cfg.gather_vjp == "raydedup"


def test_agg_intrp_order_validation():
    """order 1 threads through (dtu_test_inf configs); order 0 is rejected
    at first forward (dead in the reference too — its decode branch is
    missing, UnboundLocalError at point_aggregators.py:715/:745), while
    default-flag parses/config builds keep working (flag default is 0)."""
    import dataclasses as dc
    import jax
    from sgnerf_tpu.options.options import configs_from_opt
    from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                              init_aggregator_params,
                                              aggregate)

    opt = TrainOptions().parse(["--name", "t", "--agg_intrp_order", "1"])
    cfg, _, _ = configs_from_opt(opt)
    assert cfg.agg.agg_intrp_order == 1

    opt = TrainOptions().parse(["--name", "t"])     # default 0 still parses
    cfg, _, _ = configs_from_opt(opt)
    assert cfg.agg.agg_intrp_order == 0

    acfg = AggregatorConfig(agg_intrp_order=0)
    params = init_aggregator_params(jax.random.key(0), acfg)
    z = jax.numpy.zeros
    with pytest.raises(ValueError, match="agg_intrp_order"):
        aggregate(params, acfg,
                  sampled_embedding=z((1, 2, 2, 2, 32)),
                  sampled_color=None, sampled_dir=None, sampled_conf=None,
                  sampled_label_embedding=None,
                  sampled_xyz=z((1, 2, 2, 2, 3)),
                  sampled_xyz_pers=z((1, 2, 2, 2, 3)),
                  sample_pnt_mask=z((1, 2, 2, 2), bool),
                  sample_loc=z((1, 2, 2, 3)), sample_loc_w=z((1, 2, 2, 3)),
                  sample_ray_dirs=z((1, 2, 2, 3)))
