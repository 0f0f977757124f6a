"""Batched homomorphic executor for mapped FBS programs.

Compiles a :class:`LutProgram` into a *levelized plan* and runs it under
TFHE on device.  Design (SURVEY.md §5 "level-wise batched bootstrapping"):

* The IR invariant (lincomb flattening, ``lut_program.py``) guarantees every
  lincomb reads only inputs/bootstrap outputs, so the program is an
  alternating lincomb/bootstrap DAG.  Wires (= LWE ciphertexts, big key)
  exist only for inputs and bootstrap outputs; lincombs are fused into the
  bootstrap that consumes them.
* Bootstraps are grouped by depth level; all bootstraps of a level run as
  ONE batched blind rotation — with a user batch of V circuit evaluations,
  the kernel batch is (bootstraps_in_level × V).
* The compiled plan is static arrays (gather indices, coefficient matrices,
  test polynomials), so each level step is a single jitted call.

This is the component the reference delegates wholesale to Zama Concrete
(SURVEY.md §2 C18): it executes ``.lbf`` programs homomorphically with
decryptions bit-exact against ``LutProgram.eval``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..frontend.lut_program import (LutProgram, N_BOOT, N_CONST, N_INPUT,
                                    N_LIN)
from ..tfhe.encrypt import decode, encrypt_values, lwe_phase
from ..tfhe.keys import TFHEKeys
from ..tfhe.numeric import I32
from ..tfhe.pbs import build_test_vector, functional_bootstrap
from ..tfhe.params import TFHEParams

__all__ = ["CircuitExecutor", "LevelPlan"]


@dataclass
class LevelPlan:
    """Static tensors for one level of batched bootstraps."""

    wire_idx: np.ndarray     # [nb, T] gather rows into the wire buffer
    coefs: np.ndarray        # [nb, T] int32 lincomb coefficients (0-padded)
    consts: np.ndarray       # [nb] int32 lincomb constant * delta (torus)
    test_polys: np.ndarray   # [nb, N] int32
    posts: np.ndarray        # [nb] int32 post-rotation body offsets
    out_rows: np.ndarray     # [nb] destination rows in the wire buffer


@dataclass
class OutputSpec:
    kind: str                # "wire" | "lin" | "const"
    wire_idx: np.ndarray     # for lin: [T]; for wire: [1]
    coefs: np.ndarray
    const: int               # const term (value units) / const value


class CircuitExecutor:
    def __init__(self, prog: LutProgram, keys: TFHEKeys,
                 fast_keys=None, mesh=None):
        """``fast_keys``: optional :class:`ops.blind_rotate.FastKeys`; when
        given, bootstraps run on the MXU fast path instead of the generic
        gather-based external product.

        ``mesh``: optional :class:`jax.sharding.Mesh` with a ``"dp"`` axis
        (and optionally ``"tp"``).  The wire buffer ``[num_wires, V, d]`` is
        dp-sharded on the evaluation batch V and every level step runs
        sharded: the fused Pallas / generic orientations via ``shard_map``
        (a ``pallas_call`` is opaque to the GSPMD partitioner; the circuit
        plan and key material replicate, each device bootstraps its batch
        slice — no collectives, DP over ciphertexts rides for free), the
        ``matmul`` orientation via GSPMD with the key contraction tp-sharded
        (partial external products meet in an ICI psum)."""
        self.prog = prog
        self.keys = keys
        self.fast_keys = fast_keys
        self.mesh = mesh
        self.params: TFHEParams = keys.params
        self._compile(prog)
        self._sharded_step = None
        if mesh is not None:
            assert "dp" in mesh.axis_names, "executor mesh needs a dp axis"
            self._sharded_step = self._build_sharded_step()

    # ------------------------------------------------------------- compile
    def _compile(self, prog: LutProgram) -> None:
        params = self.params
        wire_row: dict[str, int] = {}
        self.input_rows: dict[str, int] = {}
        levels: dict[int, list] = {}
        node_level: dict[str, int] = {}

        def lin_parts(node):
            rows, coefs = [], []
            for c, v in node.terms:
                rows.append(wire_row[v.name])
                coefs.append(int(c))
            return rows, coefs, int(node.const)

        for node in prog.nodes:
            if node.kind == N_INPUT:
                wire_row[node.name] = len(wire_row)
                self.input_rows[node.name] = wire_row[node.name]
                node_level[node.name] = 0
            elif node.kind == N_LIN:
                lv = max((node_level[v.name] for _, v in node.terms),
                         default=0)
                node_level[node.name] = lv
            elif node.kind == N_BOOT:
                src = node.src
                if src.kind == N_LIN:
                    rows, coefs, const = lin_parts(src)
                    lv = node_level[src.name] + 1
                else:  # bootstrap of a raw input/bootstrap wire
                    rows, coefs, const = [wire_row[src.name]], [1], 0
                    lv = node_level[src.name] + 1
                row = len(wire_row)
                wire_row[node.name] = row
                node_level[node.name] = lv
                tv, post = build_test_vector(node.table, params)
                levels.setdefault(lv, []).append(
                    (rows, coefs, const, tv, post, row))

        # One extra dummy wire row receives the results of padding slots, so
        # every level can be padded to a power-of-two bootstrap count and
        # share a handful of compiled kernel shapes instead of one per level.
        self.dummy_row = len(wire_row)
        self.num_wires = len(wire_row) + 1
        self.num_bootstraps = sum(len(v) for v in levels.values())

        t_global = max((len(rows) for v in levels.values()
                        for rows, *_ in v), default=1)

        def bucket(nb: int) -> int:
            b = 1
            while b < nb:
                b *= 2
            return b

        self.levels: list[LevelPlan] = []
        for lv in sorted(levels):
            entries = levels[lv]
            nb = bucket(len(entries))
            wire_idx = np.zeros((nb, t_global), dtype=np.int32)
            coefs = np.zeros((nb, t_global), dtype=np.int32)
            consts = np.zeros(nb, dtype=np.int32)
            tvs = np.zeros((nb, params.poly_size), dtype=np.int32)
            posts = np.zeros(nb, dtype=np.int32)
            out_rows = np.full(nb, self.dummy_row, dtype=np.int32)
            for j, (rows, cfs, const, tv, post, row) in enumerate(entries):
                wire_idx[j, :len(rows)] = rows
                coefs[j, :len(cfs)] = cfs
                consts[j] = np.int64(const * params.delta) \
                    .astype(np.uint32).astype(np.int32)
                tvs[j] = tv
                posts[j] = np.int64(post).astype(np.uint32).astype(np.int32)
                out_rows[j] = row
            self.levels.append(LevelPlan(wire_idx, coefs, consts, tvs,
                                         posts, out_rows))

        # outputs
        self.outputs: dict[str, OutputSpec] = {}
        for name, node in prog.outputs.items():
            if node.kind == N_CONST:
                self.outputs[name] = OutputSpec("const", np.zeros(0, np.int32),
                                                np.zeros(0, np.int32),
                                                node.const)
            elif node.kind == N_LIN:
                rows, cfs, const = lin_parts(node)
                self.outputs[name] = OutputSpec(
                    "lin", np.asarray(rows, np.int32),
                    np.asarray(cfs, np.int32), const)
            else:
                self.outputs[name] = OutputSpec(
                    "wire", np.asarray([wire_row[node.name]], np.int32),
                    np.asarray([1], np.int32), 0)

    # ------------------------------------------------------------- sharding
    def _buf_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self.mesh, P(None, "dp"))

    def _build_sharded_step(self):
        """One jitted mesh-sharded level step (see ``__init__`` docstring)."""
        import jax
        from jax.sharding import PartitionSpec as P

        mesh, keys, fast = self.mesh, self.keys, self.fast_keys
        buf_sharding = self._buf_sharding()

        if fast is not None and fast.orientation == "matmul":
            # GSPMD path: dp-sharded batch, tp-sharded key contraction.
            from ..parallel.mesh import shard_fast_keys
            self.fast_keys = fast = shard_fast_keys(mesh, fast)

            @jax.jit
            def step(buf, *plan):
                return _level_step(keys, fast, buf, *plan)

            return step

        # fused / fused_otf / conv / generic: shard_map over dp with the
        # plan and keys replicated.  tp (if present in the mesh) is left
        # unmapped — these orientations have no sharded contraction.
        if fast is not None:
            from ..ops.blind_rotate import FastKeys
            key_args = (fast.bsk_kernels, fast.ksk_limbs)
            orientation = fast.orientation

            def local(bsk, ksk, buf, *plan):
                fk = FastKeys(keys.params, bsk, ksk, orientation)
                return _level_step(keys, fk, buf, *plan)
        else:
            key_args = (keys.bsk, keys.ksk)

            def local(bsk, ksk, buf, *plan):
                k = TFHEKeys(params=keys.params, lwe_key=None,
                             glwe_key=None, bsk=bsk, ksk=ksk)
                return _level_step(k, None, buf, *plan)

        mapped = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(None, "dp")) + (P(),) * 6,
            out_specs=P(None, "dp"), check_vma=False)
        jitted = jax.jit(mapped, out_shardings=buf_sharding)

        def step(buf, *plan):
            return jitted(*key_args, buf, *plan)

        return step

    # ---------------------------------------------------------------- run
    def encrypt_inputs(self, values: dict[str, np.ndarray],
                       rng: np.random.Generator) -> jnp.ndarray:
        """Build the initial wire buffer [num_wires, V, kN+1].

        All inputs are encrypted in ONE batched device call — per-input
        round trips over the tunneled backend cost seconds each.
        """
        v = len(next(iter(values.values()))) if values else 1
        d = self.params.big_dim + 1
        buf = jnp.zeros((self.num_wires, v, d), dtype=np.int32)
        names = list(self.input_rows)
        if names:
            flat = np.concatenate([np.asarray(values[n]) for n in names])
            cts = encrypt_values(self.keys, flat, rng)
            cts = cts.reshape(len(names), v, d)
            rows = jnp.asarray([self.input_rows[n] for n in names])
            # device-side scatter — reading the ciphertexts back to host
            # costs ~MB/s over the tunneled backend
            buf = buf.at[rows].set(cts)
        if self.mesh is not None:
            import jax
            dp = self.mesh.shape["dp"]
            assert v % dp == 0, \
                f"batch {v} must be divisible by the dp axis ({dp})"
            buf = jax.device_put(buf, self._buf_sharding())
        return buf

    def run(self, buf: jnp.ndarray, checkpoint: str | None = None,
            checkpoint_every: int = 8) -> jnp.ndarray:
        """Execute all levels; returns the filled wire buffer.

        ``checkpoint``: optional ``.npz`` path.  The wire buffer is saved
        every ``checkpoint_every`` levels, and a matching file resumes the
        run from the level after its snapshot — the TPU-native analogue of
        the reference harness's make-level file-existence resume
        (SURVEY.md §5 "Checkpoint / resume").  Deep unrolled circuits
        (Trivium/Kreyvium streams) take minutes per batch; a preemption
        costs at most ``checkpoint_every`` levels.
        """
        start = 0
        if checkpoint is not None:
            try:
                with np.load(checkpoint) as z:
                    if z["num_levels"] == len(self.levels) \
                            and z["buf"].shape == tuple(buf.shape):
                        start = int(z["level"]) + 1
                        buf = jnp.asarray(z["buf"])
                        if self.mesh is not None:
                            import jax
                            buf = jax.device_put(buf, self._buf_sharding())
            except FileNotFoundError:
                pass
        step = self._sharded_step
        for lv, plan in enumerate(self.levels):
            if lv < start:
                continue
            plan_args = (jnp.asarray(plan.wire_idx),
                         jnp.asarray(plan.coefs),
                         jnp.asarray(plan.consts),
                         jnp.asarray(plan.test_polys),
                         jnp.asarray(plan.posts),
                         jnp.asarray(plan.out_rows))
            if step is not None:
                buf = step(buf, *plan_args)
            else:
                buf = _level_step(self.keys, self.fast_keys, buf, *plan_args)
            if checkpoint is not None \
                    and (lv + 1) % checkpoint_every == 0 \
                    and lv + 1 < len(self.levels):
                np.savez(checkpoint, buf=np.asarray(buf), level=lv,
                         num_levels=len(self.levels))
        return buf

    def decrypt_outputs(self, buf: jnp.ndarray) -> dict[str, np.ndarray]:
        """ONE batched gather+lincomb+phase device call for all outputs
        (per-output round trips over the tunneled backend cost seconds)."""
        params = self.params
        key = self.keys.extracted_key
        out: dict[str, np.ndarray] = {}
        v = buf.shape[1]
        names = [n for n, s in self.outputs.items() if s.kind != "const"]
        for name, spec in self.outputs.items():
            if spec.kind == "const":
                out[name] = np.full(v, spec.const, dtype=np.int64)
        if not names:
            return out
        t_max = max(1, max(len(self.outputs[n].wire_idx) for n in names))
        idx = np.full((len(names), t_max), self.dummy_row, dtype=np.int32)
        cfs = np.zeros((len(names), t_max), dtype=np.int32)
        consts = np.zeros(len(names), dtype=np.int32)
        for o, name in enumerate(names):
            spec = self.outputs[name]
            idx[o, :len(spec.wire_idx)] = spec.wire_idx
            cfs[o, :len(spec.coefs)] = spec.coefs
            consts[o] = np.int64(spec.const * params.delta) \
                .astype(np.uint32).astype(np.int32)
        cts = buf[jnp.asarray(idx)]                        # [O, T, V, d]
        lin = jnp.einsum("ot,otvd->ovd", jnp.asarray(cfs), cts,
                         preferred_element_type=I32)
        lin = lin.at[:, :, -1].add(jnp.asarray(consts)[:, None])
        phases = np.asarray(lwe_phase(key, lin.reshape(-1, lin.shape[-1])))
        decoded = decode(phases, params).reshape(len(names), v)
        for o, name in enumerate(names):
            out[name] = decoded[o]
        return out

    def run_cleartext(self, values: dict[str, np.ndarray],
                      seed: int = 0) -> dict[str, np.ndarray]:
        """encrypt → run → decrypt convenience wrapper."""
        rng = np.random.default_rng(seed)
        buf = self.encrypt_inputs(values, rng)
        buf = self.run(buf)
        return self.decrypt_outputs(buf)


def _level_step(keys: TFHEKeys, fast_keys, buf, wire_idx, coefs, consts,
                tvs, posts, out_rows):
    """One level: fused lincombs + one batched FBS + scatter of results.

    The kernel batch is flattened V-major so a dp-sharded V axis stays the
    leading (sharded) axis of the bootstrap batch — no cross-shard
    data movement when the executor runs under a mesh."""
    nb, t_max = wire_idx.shape
    _, v, d = buf.shape
    gathered = buf[wire_idx]                              # [nb, T, V, d]
    lin = jnp.einsum("nt,ntvd->nvd", coefs, gathered,
                     preferred_element_type=I32)
    lin = lin.at[:, :, -1].add(consts[:, None])
    flat = jnp.transpose(lin, (1, 0, 2)).reshape(v * nb, d)
    tvs_flat = jnp.tile(tvs, (v, 1))
    posts_flat = jnp.tile(posts, (v,))
    if fast_keys is not None:
        from ..ops.blind_rotate import functional_bootstrap_fast
        fresh = functional_bootstrap_fast(fast_keys, flat, tvs_flat,
                                          posts_flat)
    else:
        fresh = functional_bootstrap(keys, flat, tvs_flat, posts_flat)
    fresh = jnp.transpose(fresh.reshape(v, nb, d), (1, 0, 2))
    return buf.at[out_rows].set(fresh)
