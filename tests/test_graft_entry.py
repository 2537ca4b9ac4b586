"""Driver-contract smoke: dryrun_multichip runs on the virtual CPU mesh
inside the test env (conftest provides 8 devices), pinning the exact
code path the external driver executes."""

import pytest

import __graft_entry__


@pytest.mark.slow
def test_dryrun_multichip_two_devices(capsys):
    __graft_entry__.dryrun_multichip(2)
    out = capsys.readouterr().out
    assert "[dryrun_multichip] OK on 2 devices" in out


def test_dryrun_multichip_rejects_oversized_mesh():
    import pytest
    with pytest.raises(RuntimeError, match="need 99 devices"):
        __graft_entry__.dryrun_multichip(99)
