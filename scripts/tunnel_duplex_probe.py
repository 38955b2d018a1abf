#!/usr/bin/env python
"""Probe whether the axon tunnel overlaps opposite-direction transfers.

Times (a) a ~29 MB upload alone, (b) a ~26 MB pull alone, (c) both issued
concurrently from two threads.  Full-duplex -> (c) ~ max(a, b); serialised
-> (c) ~ a + b.  Fresh content every buffer (the client memoizes by hash).
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def fresh_host(n, seed):
    return np.random.default_rng(seed).integers(-32768, 32767, size=n).astype(np.int16)


def force_upload(h):
    dev = jax.device_put(h)
    jax.block_until_ready(jnp.sum(dev[:8]))
    return dev


def make_pullable(n, seed):
    # device-resident int16 the host has never seen (fresh content)
    dev = jax.block_until_ready(
        (jnp.arange(n, dtype=jnp.int32) * (seed + 7) % 32003 - 16000).astype(jnp.int16))
    return dev


def main():
    n_up = 14_400_000   # ~29 MB int16
    n_dn = 13_230_000   # ~26 MB int16

    # warm the tiny-sum program
    force_upload(fresh_host(16, 0))

    for trial in range(2):
        s = int(time.time()) % 100000 + trial * 17

        h = fresh_host(n_up, s)
        t0 = time.perf_counter()
        force_upload(h)
        t_up = time.perf_counter() - t0

        dev = make_pullable(n_dn, s)
        t0 = time.perf_counter()
        np.asarray(dev)
        t_dn = time.perf_counter() - t0

        h2 = fresh_host(n_up, s + 1)
        dev2 = make_pullable(n_dn, s + 1)
        walls = {}

        def up():
            t = time.perf_counter()
            force_upload(h2)
            walls["up"] = time.perf_counter() - t

        def dn():
            t = time.perf_counter()
            np.asarray(dev2)
            walls["dn"] = time.perf_counter() - t

        t0 = time.perf_counter()
        ts = [threading.Thread(target=up), threading.Thread(target=dn)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        t_both = time.perf_counter() - t0

        print(f'{{"trial": {trial}, "up_s": {t_up:.2f}, "dn_s": {t_dn:.2f}, '
              f'"both_s": {t_both:.2f}, '
              f'"verdict": "{"full-duplex" if t_both < (t_up + t_dn) * 0.75 else "serialised"}"}}',
              flush=True)


if __name__ == "__main__":
    main()
