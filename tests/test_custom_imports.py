"""``custom_imports`` extension seam: a third-party component registers
itself from a config file alone (ref yanerf/utils/config.py:322-323).

The out-of-tree package lives in a tmp dir on sys.path/PYTHONPATH; the config
names it in ``custom_imports`` and uses its registered model type. Nothing in
the framework imports the package — the config load must do it.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

THIRD_PARTY_MODULE = '''
"""Out-of-tree model package used only via custom_imports."""
from yanerf_tpu.models.builder import MODELS
from yanerf_tpu.models.nerf_mlp import NeRFMLP


@MODELS.register_module()
class ThirdPartyNeRF(NeRFMLP):
    """Proof-of-registration subclass (would be a real custom model)."""
'''


def _write_pkg(tmp_path: Path) -> Path:
    pkg = tmp_path / "thirdparty_pkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "models.py").write_text(THIRD_PARTY_MODULE)
    return tmp_path


def test_fromfile_imports_custom_modules(tmp_path, monkeypatch):
    root = _write_pkg(tmp_path)
    monkeypatch.syspath_prepend(str(root))
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(
        "custom_imports: { imports: [thirdparty_pkg.models], allow_failed_imports: false }\n"
        "model: { type: ThirdPartyNeRF, n_layers: 2 }\n"
    )
    from yanerf_tpu.models.builder import MODELS
    from yanerf_tpu.utils.config import Config

    assert "ThirdPartyNeRF" not in MODELS
    try:
        cfg = Config.fromfile(cfg_path)
        assert "ThirdPartyNeRF" in MODELS
        assert cfg.model.type == "ThirdPartyNeRF"
    finally:
        # keep the global registry clean for other tests
        MODELS._module_dict.pop("ThirdPartyNeRF", None)
        sys.modules.pop("thirdparty_pkg.models", None)
        sys.modules.pop("thirdparty_pkg", None)


def test_fromfile_missing_custom_import_raises(tmp_path):
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(
        "custom_imports: { imports: [no_such_pkg_anywhere], allow_failed_imports: false }\n"
    )
    from yanerf_tpu.utils.config import Config

    with pytest.raises(ImportError):
        Config.fromfile(cfg_path)
    # opt-out flag skips the imports entirely
    Config.fromfile(cfg_path, import_custom_modules=False)


@pytest.mark.slow
def test_cli_trains_config_only_third_party_model(tmp_path):
    """End-to-end: scripts/run.py trains a model whose class only exists in
    an out-of-tree package named by the config's custom_imports."""
    from tests.test_cli import CFG_TEMPLATE, _make_blender

    root = _write_pkg(tmp_path)
    data_dir = tmp_path / "data"
    _make_blender(data_dir)
    output_root = tmp_path / "results"
    cfg = CFG_TEMPLATE.format(data_dir=data_dir, output_dir=output_root)
    cfg = cfg.replace("type: NeRFMLP", "type: ThirdPartyNeRF")
    cfg = (
        "custom_imports: { imports: [thirdparty_pkg.models], allow_failed_imports: false }\n" + cfg
    )
    cfg_path = tmp_path / "thirdparty.yml"
    cfg_path.write_text(cfg)

    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(root), str(REPO_ROOT), env.get("PYTHONPATH", "")]
    )
    env.update(JAX_PLATFORMS="cpu", XLA_FLAGS="--xla_force_host_platform_device_count=8")
    result = subprocess.run(
        [sys.executable, "scripts/run.py", "--config", str(cfg_path), "--device", "cpu"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=600, env=env,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout[-2000:]}\nstderr:\n{result.stderr[-4000:]}"
    out_dir = output_root / "version_0"
    assert (out_dir / "train_stats.json").exists()
    dumped = (out_dir / "config.yml").read_text()
    assert "ThirdPartyNeRF" in dumped
