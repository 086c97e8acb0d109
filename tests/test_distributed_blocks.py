"""Grid block assignment covers the pair grid exactly once."""

from colormipsearch_tpu.parallel.distributed import block_for_process


def test_blocks_partition_grid():
    for n_masks, n_targets, nproc in ((100, 37, 8), (5, 5, 4), (13, 200, 6),
                                      (40, 40, 1)):
        covered = set()
        for pid in range(nproc):
            blk = block_for_process(n_masks, n_targets, pid, nproc)
            for m in range(blk.mask_offset, blk.mask_offset + blk.mask_length):
                for t in range(blk.target_offset,
                               blk.target_offset + blk.target_length):
                    assert (m, t) not in covered, (pid, m, t)
                    covered.add((m, t))
        assert covered == {(m, t) for m in range(n_masks)
                           for t in range(n_targets)}, (n_masks, n_targets, nproc)
