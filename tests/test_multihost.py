"""Real multi-process bring-up (VERDICT r4 item 2).

Unlike every other distributed test (8 virtual devices in ONE process),
this spawns 2 OS processes x 4 CPU devices each and joins them through
parallel.multihost.initialize — the first execution of the true
process-spanning mesh path.  Reference anchor: single-process bring-up,
fft_wgpu src/lib.rs:29-62 (extended to pod scale per SURVEY §5).

Skips ONLY when the jax build refuses CPU clusters, with the child's
actual refusal message (proof it tried).
"""

import pytest

from fft_wgpu_tpu.parallel.multihost_selftest import (
    MultihostUnavailable,
    launch_cluster,
)


@pytest.mark.slow
def test_two_process_cluster_fft_parity():
    try:
        outs = launch_cluster(num_processes=2, devices_per_proc=4)
    except MultihostUnavailable as e:
        pytest.skip(f"jax build refuses CPU clusters: {e}")
    assert len(outs) == 2
    for out in outs:
        assert "MULTIHOST_SELFTEST_OK" in out
        assert "devices=8" in out
