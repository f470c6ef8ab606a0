"""Top-level package surface: lazy re-exports resolve and stay cheap.

The reference exposes its workflow at the package root (reconstructed
``attend_infer_repeat/__init__`` re-exporting model/experiment entry
points — SURVEY §2 L6); ours mirrors that with PEP 562 lazy exports.
"""

import os
import pathlib
import subprocess
import sys

import attend_infer_repeat_tpu as air

_REPO_ROOT = pathlib.Path(__file__).parents[1]


def test_every_export_resolves():
    for name in air.__all__:
        obj = getattr(air, name)
        assert obj is not None, name


def test_train_callable_after_subpackage_import():
    """``air.train(...)`` must work even when the ``train`` SUBPACKAGE
    was imported first: that import sets the package attribute to the
    module object, bypassing the lazy function export (ADVICE r3,
    medium).  The subpackage module is callable by design — calling it
    with a bogus preset must reach the real ``loop.train`` (KeyError),
    not die with TypeError('module' object is not callable)."""
    code = (
        "import attend_infer_repeat_tpu as air\n"
        "import attend_infer_repeat_tpu.train  # shadows the lazy export\n"
        "import attend_infer_repeat_tpu.train.loop as loop\n"
        "assert air.train.train is loop.train\n"
        "try:\n"
        "    air.train('no_such_preset')\n"
        "except KeyError:\n"
        "    pass  # reached the real train(): the module was callable\n"
    )
    env = dict(os.environ, PYTHONPATH=str(_REPO_ROOT))
    proc = subprocess.run([sys.executable, "-c", code],
                          env=env, cwd=_REPO_ROOT, capture_output=True)
    assert proc.returncode == 0, proc.stderr.decode()


def test_dir_matches_all():
    assert set(air.__all__) <= set(dir(air))


def test_unknown_attribute_raises():
    import pytest
    with pytest.raises(AttributeError):
        air.does_not_exist


def test_import_is_lazy():
    # importing the package root must not drag in jax/flax; the repo
    # root is passed explicitly so the test doesn't depend on the
    # caller's cwd (ADVICE r3 #3)
    code = ("import sys; import attend_infer_repeat_tpu; "
            "sys.exit(1 if 'jax' in sys.modules else 0)")
    proc = subprocess.run([sys.executable, "-c", code],
                          env={"PATH": "", "PYTHONPATH": str(_REPO_ROOT)},
                          cwd=_REPO_ROOT, capture_output=True)
    assert proc.returncode == 0, proc.stderr.decode()


def test_workflow_symbols_are_the_submodule_objects():
    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.models import AIRModel
    assert air.get_config is get_config
    assert air.AIRModel is AIRModel
