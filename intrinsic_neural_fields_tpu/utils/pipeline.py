"""Lookahead pipelining over async device dispatches.

JAX dispatch is asynchronous: `dispatch(item)` enqueues device work and
returns immediately; the blocking cost (device->host wire, host post-
processing) is paid in `finish`. Keeping up to `depth` dispatches in
flight overlaps item i's wire/host work with item i+1..i+depth's device
compute — on a slow link (the ~30MB/s axon tunnel) this is the difference
between the chip idling most of each frame and running flat out
(RESULTS.md "Render wall-clock throughput"). Async dispatch is a pure
reordering, so results are bit-identical to the serial loop.

Used by the eval CLI, render_video, and the render/preprocess benches;
data/preprocess.py keeps its own deque because its producer and consumer
live in different methods of a stateful class.
"""
from collections import deque


def pipelined_foreach(items, dispatch, finish, depth=2):
    """For each item: handle = dispatch(item); later finish(item, handle).

    `finish` runs in item order, lagging `dispatch` by up to `depth` items.
    depth=0 degenerates to the serial loop. Returns the number of items
    processed.
    """
    pending = deque()
    n = 0
    for item in items:
        pending.append((item, dispatch(item)))
        if len(pending) > depth:
            it, handle = pending.popleft()
            finish(it, handle)
            n += 1
    while pending:
        it, handle = pending.popleft()
        finish(it, handle)
        n += 1
    return n
