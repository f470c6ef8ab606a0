"""Top-level package surface: lazy re-exports resolve and stay cheap.

The reference exposes its workflow at the package root (reconstructed
``attend_infer_repeat/__init__`` re-exporting model/experiment entry
points — SURVEY §2 L6); ours mirrors that with PEP 562 lazy exports.
"""

import subprocess
import sys

import attend_infer_repeat_tpu as air


def test_every_export_resolves():
    for name in air.__all__:
        obj = getattr(air, name)
        assert obj is not None, name


def test_dir_matches_all():
    assert set(air.__all__) <= set(dir(air))


def test_unknown_attribute_raises():
    import pytest
    with pytest.raises(AttributeError):
        air.does_not_exist


def test_import_is_lazy():
    # importing the package root must not drag in jax/flax
    code = ("import sys; import attend_infer_repeat_tpu; "
            "sys.exit(1 if 'jax' in sys.modules else 0)")
    proc = subprocess.run([sys.executable, "-c", code],
                          env={"PATH": "", "PYTHONPATH": ""},
                          cwd=".", capture_output=True)
    assert proc.returncode == 0, proc.stderr.decode()


def test_workflow_symbols_are_the_submodule_objects():
    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.models import AIRModel
    assert air.get_config is get_config
    assert air.AIRModel is AIRModel
