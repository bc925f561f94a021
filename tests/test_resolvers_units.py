"""Unit tests: checkpoint-path sibling resolution and mesh resolution."""

import jax
import pytest

from mmtpu.checkpoints.manager import resolve_checkpoint_path


def test_resolve_checkpoint_path_exact_wins(tmp_path):
    p = tmp_path / "best.pth"
    p.write_bytes(b"x")
    (tmp_path / "best.ckpt").write_bytes(b"y")
    assert resolve_checkpoint_path(p) == p


def test_resolve_checkpoint_path_falls_back_to_ckpt(tmp_path):
    (tmp_path / "best.ckpt").write_bytes(b"y")
    assert resolve_checkpoint_path(tmp_path / "best.pth") == tmp_path / "best.ckpt"


def test_resolve_checkpoint_path_missing_returns_original(tmp_path):
    p = tmp_path / "best.pth"
    assert resolve_checkpoint_path(p) == p  # caller raises its own error


class _Cfg:
    def __init__(self, dp=None, batch_sizes=()):
        class E:
            data_parallel = dp

        class D:
            datasets = {
                str(i): type("DS", (), {"batch_size": b})()
                for i, b in enumerate(batch_sizes)
            }

        self.experiment = E()
        self.data = D()


def test_resolve_mesh_defaults_to_none():
    from mmtpu.cli.common import resolve_mesh

    assert resolve_mesh(_Cfg(dp=None)) is None
    assert resolve_mesh(_Cfg(dp=0)) is None
    assert resolve_mesh(_Cfg(dp=1)) is None


def test_resolve_mesh_rejects_below_minus_one():
    from mmtpu.cli.common import resolve_mesh

    with pytest.raises(ValueError, match="use -1"):
        resolve_mesh(_Cfg(dp=-2))


def test_resolve_mesh_rejects_oversubscription():
    from mmtpu.cli.common import resolve_mesh

    with pytest.raises(ValueError, match="devices visible"):
        resolve_mesh(_Cfg(dp=jax.device_count() + 1))


def test_resolve_mesh_rejects_indivisible_batch():
    from mmtpu.cli.common import resolve_mesh

    with pytest.raises(ValueError, match="not divisible"):
        resolve_mesh(_Cfg(dp=-1, batch_sizes=(30,)))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_resolve_mesh_all_devices():
    from mmtpu.cli.common import resolve_mesh
    from mmtpu.parallel.mesh import DATA_AXIS

    mesh = resolve_mesh(_Cfg(dp=-1, batch_sizes=(32, 64)))
    assert mesh is not None
    assert mesh.shape[DATA_AXIS] == jax.device_count()
