import time

from websplat_tpu.utils.stopwatch import FrameClock, RingBuffer, StageStopwatch


def test_ring_buffer_wraps():
    rb = RingBuffer(4)
    for i in range(6):
        rb.push(i)
    assert len(rb) == 4
    assert rb.to_list() == [2, 3, 4, 5]


def test_ring_buffer_partial():
    rb = RingBuffer(4)
    rb.push(1)
    rb.push(2)
    assert rb.to_list() == [1, 2]


def test_stage_stopwatch():
    sw = StageStopwatch()
    with sw.stage("a"):
        time.sleep(0.01)
    with sw.stage("b"):
        pass
    m = sw.take_measurements()
    assert m["a"] >= 0.01
    assert "b" in m
    assert sw.take_measurements() == {}


def test_frame_clock_ema():
    fc = FrameClock(alpha=0.5)
    fc.tick()
    time.sleep(0.01)
    fps = fc.tick()
    assert 0 < fps < 200
    assert len(fc.history) == 1
