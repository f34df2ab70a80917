"""Driver entry points: the multichip dryrun must stay hermetic on the CPU
mesh (round-1 regression: an eager op dispatched to a broken TPU plugin)."""
import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally vs a dense reference
