"""Unit tests for the HBM-floor analyzer (``scripts/hbm_floor.py``).

The round-5 ceiling argument (README §"The analytic HBM floor") rests on the
fusion-boundary partition of the train-step jaxpr; these tests pin its
mechanics on tiny graphs whose traffic is hand-computable, so the 1.89
GB/img production figure is backed by a verified model rather than an
unchecked script.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from hbm_floor import MATERIALIZING, analyze, flatten_jaxpr, fusion_floor


def _jaxpr(fn, *args):
    return jax.make_jaxpr(fn)(*args).jaxpr


class TestFlatten:
    def test_flat_function_eqns_and_io(self):
        def f(x, w):
            return jnp.dot(jax.nn.relu(x), w)

        x = jnp.zeros((8, 16), jnp.float32)
        w = jnp.zeros((16, 4), jnp.float32)
        eqns, avals, top_in, top_out = flatten_jaxpr(_jaxpr(f, x, w))
        prims = [p for p, _, _ in eqns]
        assert "dot_general" in prims
        assert len(top_in) == 2
        assert len(top_out) == 1

    def test_pjit_subjaxpr_is_inlined(self):
        inner = jax.jit(lambda x: jax.nn.relu(x) * 2.0)

        def f(x, w):
            return jnp.dot(inner(x), w)

        x = jnp.zeros((8, 16), jnp.float32)
        w = jnp.zeros((16, 4), jnp.float32)
        eqns, *_ = flatten_jaxpr(_jaxpr(f, x, w))
        prims = [p for p, _, _ in eqns]
        # the relu inside the nested pjit must be visible in the flat list
        assert any(p in ("max", "pjit") for p in prims)
        assert "dot_general" in prims
        # connectivity across the call boundary: the dot's activation operand
        # must be the output of an eqn in the flat list, not an orphan var
        producers = {o for _, _, outs in eqns for o in outs}
        dot_ins = next(ins for p, ins, _ in eqns if p == "dot_general")
        assert any(i in producers for i in dot_ins)


class TestFusionFloor:
    def test_single_matmul_exact_bytes(self):
        # y = x @ w : one kernel, reads x+w, writes y — nothing else
        def f(x, w):
            return jnp.dot(x, w)

        x = jnp.zeros((128, 256), jnp.float32)
        w = jnp.zeros((256, 64), jnp.float32)
        st = fusion_floor(_jaxpr(f, x, w))
        assert st["fusion_read"] == (128 * 256 + 256 * 64) * 4
        assert st["fusion_written"] == 128 * 64 * 4

    def test_elementwise_chain_fuses_to_one_kernel(self):
        # relu(x*2+1): all elementwise → ONE fused kernel, read x, write out
        def f(x):
            return jax.nn.relu(x * 2.0 + 1.0)

        x = jnp.zeros((64, 64), jnp.float32)
        st = fusion_floor(_jaxpr(f, x))
        assert st["fusion_read"] == 64 * 64 * 4
        assert st["fusion_written"] == 64 * 64 * 4

    def test_elementwise_bridge_between_matmuls_is_charged(self):
        # (relu(x@w)) @ v — the relu cannot fuse into either custom-call, so
        # the bridge tensor is written once (by the relu kernel) and read
        # once (by the second matmul), ON TOP of the pure-matmul traffic.
        def f(x, w, v):
            return jnp.dot(jax.nn.relu(jnp.dot(x, w)), v)

        n = 32
        x = jnp.zeros((n, n), jnp.float32)
        w = jnp.zeros((n, n), jnp.float32)
        v = jnp.zeros((n, n), jnp.float32)
        st = fusion_floor(_jaxpr(f, x, w, v))
        t = n * n * 4
        # reads: x,w (mm1) + h (relu) + r,v (mm2); writes: h (mm1), r (relu),
        # out (mm2)
        assert st["fusion_read"] == 5 * t
        assert st["fusion_written"] == 3 * t

    def test_direct_matmul_chain_has_no_bridge(self):
        # (x@w)@v with no elementwise in between: the intermediate is written
        # by mm1 and read by mm2 — exactly once each.
        def f(x, w, v):
            return jnp.dot(jnp.dot(x, w), v)

        n = 32
        x = jnp.zeros((n, n), jnp.float32)
        w = jnp.zeros((n, n), jnp.float32)
        v = jnp.zeros((n, n), jnp.float32)
        st = fusion_floor(_jaxpr(f, x, w, v))
        t = n * n * 4
        assert st["fusion_read"] == 4 * t  # x,w + h,v
        assert st["fusion_written"] == 2 * t  # h + out

    def test_fanout_read_per_consuming_kernel(self):
        # h = x@w consumed by TWO separate matmul kernels → h read twice
        def f(x, w, v1, v2):
            h = jnp.dot(x, w)
            return jnp.dot(h, v1) + jnp.dot(h, v2)

        n = 16
        a = [jnp.zeros((n, n), jnp.float32) for _ in range(4)]
        st = fusion_floor(_jaxpr(f, *a))
        t = n * n * 4
        # reads: x,w | h,v1 | h,v2 | two add-operands = 8t
        assert st["fusion_read"] == 8 * t
        # writes: h, mm-out×2, add-out = 4t
        assert st["fusion_written"] == 4 * t

    def test_gather_reads_selection_not_store(self):
        def f(store, idx):
            return store[idx]

        store = jnp.zeros((1000, 64), jnp.float32)
        idx = jnp.zeros((8,), jnp.int32)
        st = fusion_floor(_jaxpr(f, store, idx))
        # gathered rows + indices read; far less than the 1000-row store
        assert st["fusion_read"] <= (8 * 64 * 4 + 8 * 4) + 64
        assert st["fusion_read"] < 1000 * 64 * 4 // 10

    def test_fusion_floor_at_least_per_consumer_floor(self):
        # on a mixed graph the fusion-boundary tier can only add traffic
        # relative to the elementwise-free per-consumer tier
        def f(x, w, v):
            h = jax.nn.gelu(jnp.dot(x, w))
            return jnp.dot(h / (1.0 + jnp.abs(h)), v)

        n = 48
        x = jnp.zeros((n, n), jnp.float32)
        w = jnp.zeros((n, n), jnp.float32)
        v = jnp.zeros((n, n), jnp.float32)
        jx = _jaxpr(f, x, w, v)
        st = fusion_floor(jx)
        base = analyze(jx, set())
        per_consumer = (base["per_consumer_reads"] + base["matmul_out_write"]
                        + base["conv_out_write"] + base["gather_write"])
        assert st["fusion_read"] + st["fusion_written"] >= per_consumer


class TestProductionFigures:
    def test_committed_floor_json_is_current(self):
        """The checked-in results/hbm_floor.json tiers must be ordered
        unique <= per_consumer <= fusion_boundary (sanity of the README
        ceiling table)."""
        import json

        path = os.path.join(os.path.dirname(__file__), "..", "results",
                            "hbm_floor.json")
        with open(path) as fh:
            r = json.load(fh)
        assert (r["floor_unique_gb_per_img"]
                <= r["floor_per_consumer_gb_per_img"]
                <= r["floor_fusion_boundary_gb_per_img"])
        ips = r["floor_img_per_sec_at_peak_hbm"]
        assert ips["fusion_boundary"] < ips["per_consumer"] < ips["unique"]
