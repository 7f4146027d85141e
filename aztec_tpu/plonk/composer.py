"""Circuit composers: gate recording, copy cycles, sigma permutations.

TPU-native re-design of the reference composer stack
(plonk/composer/composer_base.cpp, standard_composer.cpp): gate recording is
host-side Python/numpy (it is inherently sequential, tiny per gate), while
sigma-polynomial synthesis, selector transforms (iFFT + coset FFT), and key
commitments all run as device kernels.

Copy-constraint bookkeeping mirrors the reference exactly (equivalence-class
chains next/prev/real_variable_index, composer_base.hpp:333-340; cycle ->
sigma mapping with column coset encodings, composer_base.cpp:71-158) so that
identical circuits produce identical sigma polynomials.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..ff.bn254 import FR_MOD
from ..srs.reference_string import FakeReferenceStringFactory
from . import kernels
from .manifests import STANDARD, TURBO, ULTRA, StandardSettings
from .proving_key import ProvingKey, VerificationKey, ints_to_mont

NUM_RESERVED_GATES = 4  # >= num_roots_cut_out_of_vanishing_polynomial


def _next_pow2(v: int) -> int:
    n = 1
    while n < v:
        n <<= 1
    return n


@dataclasses.dataclass
class AddTriple:
    a: int
    b: int
    c: int
    a_scaling: int
    b_scaling: int
    c_scaling: int
    const_scaling: int


@dataclasses.dataclass
class MulTriple:
    a: int
    b: int
    c: int
    mul_scaling: int
    c_scaling: int
    const_scaling: int


@dataclasses.dataclass
class PolyTriple:
    a: int
    b: int
    c: int
    q_m: int
    q_l: int
    q_r: int
    q_o: int
    q_c: int


class ComposerBase:
    """Variable store + copy-cycle machinery (ref: composer_base.cpp)."""

    def __init__(self):
        self.variables: List[int] = []
        self.next_var_index: List[int] = []
        self.prev_var_index: List[int] = []
        self.real_variable_index: List[int] = []
        self.public_inputs: List[int] = []
        self.n = 0
        self.failed = False
        self.err = ""
        # positions (within public_inputs) of a deferred pairing
        # accumulator exposed by an in-circuit recursive verifier
        # (ref: composer_base add_recursive_proof)
        self.recursive_proof_public_input_indices: Optional[tuple] = None

    def add_recursive_proof(self, public_input_positions) -> None:
        """Mark this circuit as carrying a recursive-proof accumulator in
        the given public-input POSITIONS (16 limbs of P0/P1; ref:
        stdlib recursion_output.add_proof_outputs_as_public_inputs)."""
        assert len(public_input_positions) == 16
        self.recursive_proof_public_input_indices = tuple(
            public_input_positions)

    FIRST_IN_CLASS = 0xFFFFFFFF
    REAL_VARIABLE = 0xFFFFFFFE

    def add_variable(self, value: int) -> int:
        idx = len(self.variables)
        self.variables.append(value % FR_MOD)
        self.next_var_index.append(self.REAL_VARIABLE)
        self.prev_var_index.append(self.FIRST_IN_CLASS)
        self.real_variable_index.append(idx)
        return idx

    def get_variable(self, idx: int) -> int:
        return self.variables[self.real_variable_index[idx]]

    def add_public_variable(self, value: int) -> int:
        idx = self.add_variable(value)
        self.public_inputs.append(idx)
        return idx

    def set_public_input(self, idx: int):
        self.public_inputs.append(idx)

    def _first_in_class(self, idx: int) -> int:
        idx = self.real_variable_index[idx]
        while self.prev_var_index[idx] != self.FIRST_IN_CLASS:
            idx = self.prev_var_index[idx]
        return idx

    def assert_equal(self, a_idx: int, b_idx: int, msg: str = "assert_equal"):
        """ref: composer_base.cpp:8-36."""
        if self.get_variable(a_idx) != self.get_variable(b_idx) and not self.failed:
            self.failed = True
            self.err = msg
        a_real = self.real_variable_index[a_idx]
        b_real = self.real_variable_index[b_idx]
        if a_real == b_real:
            return
        b_start = self._first_in_class(b_idx)
        # update real indices of the b-chain
        cur = b_start
        while True:
            self.real_variable_index[cur] = a_real
            nxt = self.next_var_index[cur]
            if nxt == self.REAL_VARIABLE:
                break
            cur = nxt
        a_start = self._first_in_class(a_idx)
        self.next_var_index[b_real] = a_start
        self.prev_var_index[a_start] = b_real

    # -- copy cycles -> sigma mappings (ref: composer_base.cpp:38-158) -------
    def compute_sigma_mappings(self, subgroup_size: int, program_width: int):
        """Returns per-column (next_row, factor_idx) int32 arrays.

        factor_idx encodes the coset multiplier: column j -> j (0 => 1,
        1 => k1, 2 => k2), 3 => external (public input rows of sigma_1).
        """
        num_pub = len(self.public_inputs)
        wire_lists = self._wire_lists()[:program_width]

        cycles: Dict[int, List] = {}
        for i, pub in enumerate(self.public_inputs):
            real = self.real_variable_index[pub]
            cyc = cycles.setdefault(real, [])
            cyc.append((i, 0))
            cyc.append((i, 1))
        for i in range(self.n):
            for col, wl in enumerate(wire_lists):
                real = self.real_variable_index[wl[i]]
                cycles.setdefault(real, []).append((i + num_pub, col))

        next_row = [
            np.arange(subgroup_size, dtype=np.int32) for _ in range(program_width)
        ]
        factor_idx = [
            np.full(subgroup_size, c, np.int32) for c in range(program_width)
        ]
        for cyc in cycles.values():
            m = len(cyc)
            for j in range(m):
                row, col = cyc[j]
                nrow, ncol = cyc[(j + 1) % m]
                next_row[col][row] = nrow
                factor_idx[col][row] = ncol
        # public input consistency override on sigma_1 (external tag = 4)
        for i in range(num_pub):
            next_row[0][i] = i
            factor_idx[0][i] = 4
        return next_row, factor_idx

    def _wire_lists(self):
        raise NotImplementedError


class StandardComposer(ComposerBase):
    """Width-3 composer (ref: plonk/composer/standard_composer.cpp)."""

    def __init__(self, crs_factory=None, settings: StandardSettings = STANDARD):
        super().__init__()
        self.settings = settings
        self.crs_factory = crs_factory or FakeReferenceStringFactory()
        self.w_l: List[int] = []
        self.w_r: List[int] = []
        self.w_o: List[int] = []
        self.q_m: List[int] = []
        self.q_c: List[int] = []
        self.q_1: List[int] = []
        self.q_2: List[int] = []
        self.q_3: List[int] = []
        self.constant_variables: Dict[int, int] = {}
        self.zero_idx = self.put_constant_variable(0)
        self._pk: Optional[ProvingKey] = None
        self._vk: Optional[VerificationKey] = None

    def _wire_lists(self):
        return (self.w_l, self.w_r, self.w_o)

    # -- gates (ref: standard_composer.cpp:20-198) ----------------------------
    def _push(self, a, b, c, qm, q1, q2, q3, qc):
        self.w_l.append(a)
        self.w_r.append(b)
        self.w_o.append(c)
        self.q_m.append(qm % FR_MOD)
        self.q_1.append(q1 % FR_MOD)
        self.q_2.append(q2 % FR_MOD)
        self.q_3.append(q3 % FR_MOD)
        self.q_c.append(qc % FR_MOD)
        self.n += 1

    def create_add_gate(self, t: AddTriple):
        self._push(t.a, t.b, t.c, 0, t.a_scaling, t.b_scaling, t.c_scaling,
                   t.const_scaling)

    def create_mul_gate(self, t: MulTriple):
        self._push(t.a, t.b, t.c, t.mul_scaling, 0, 0, t.c_scaling,
                   t.const_scaling)

    def create_bool_gate(self, a: int):
        self._push(a, a, a, 1, 0, 0, -1, 0)

    def create_poly_gate(self, t: PolyTriple):
        self._push(t.a, t.b, t.c, t.q_m, t.q_l, t.q_r, t.q_o, t.q_c)

    def create_big_add_gate(self, a, b, c, d, a_s, b_s, c_s, d_s, const_s):
        """ref: standard_composer.cpp:35-47 (split into two width-3 gates)."""
        temp = (self.get_variable(a) * a_s + self.get_variable(b) * b_s) % FR_MOD
        temp_idx = self.add_variable(temp)
        self.create_add_gate(AddTriple(a, b, temp_idx, a_s, b_s, -1, 0))
        self.create_add_gate(AddTriple(c, d, temp_idx, c_s, d_s, 1, const_s))

    def fix_witness(self, witness_index: int, value: int):
        self._push(witness_index, getattr(self, "zero_idx", 0),
                   getattr(self, "zero_idx", 0), 0, 1, 0, 0, -value)

    def put_constant_variable(self, value: int) -> int:
        value %= FR_MOD
        if value in self.constant_variables:
            return self.constant_variables[value]
        idx = self.add_variable(value)
        self.fix_witness(idx, value)
        self.constant_variables[value] = idx
        return idx

    def create_dummy_gates(self):
        """ref: standard_composer.cpp:433-476."""
        a = self.add_variable(6)
        b = self.add_variable(7)
        c = self.add_variable((-20) % FR_MOD)
        self._push(a, b, c, 1, 2, 3, 4, 5)
        self._push(c, a, b, 1, 1, 1, 1, 127)

    # -- keys ------------------------------------------------------------------
    def subgroup_size(self) -> int:
        total = self.n + len(self.public_inputs)
        return _next_pow2(total + NUM_RESERVED_GATES)

    def compute_proving_key(self) -> ProvingKey:
        if self._pk is not None:
            return self._pk
        num_pub = len(self.public_inputs)
        size = self.subgroup_size()
        srs = self.crs_factory.get_prover_srs(size + 1)
        pk = ProvingKey(size, num_pub, srs, self.settings)

        # selectors: [0]*pub + gates + 0-pad + trailing 1
        # (ref: composer_base.cpp:160-214 compute_proving_key_base)
        for name, coeffs in (
            ("q_m", self.q_m), ("q_c", self.q_c), ("q_1", self.q_1),
            ("q_2", self.q_2), ("q_3", self.q_3),
        ):
            padded = (
                [0] * num_pub + list(coeffs)
                + [0] * (size - 1 - self.n - num_pub) + [1]
            )
            pk.add_polynomial("selector", name, ints_to_mont(padded))

        # sigma permutations
        next_rows, factor_idx = self.compute_sigma_mappings(size, 3)
        for i in range(3):
            lag = kernels.sigma_from_mapping(
                jnp.asarray(next_rows[i]), jnp.asarray(factor_idx[i]),
                pk.omega_pows, size,
            )
            pk.add_polynomial("permutation", f"sigma_{i+1}", lag,
                              keep_lagrange=True)
        self._pk = pk
        return pk

    def compute_witness(self):
        """Wire lagrange polynomials as device planes.

        Layout (ref: composer_base.cpp:216-264): first num_pub rows carry the
        public input value in w_1 and w_2 (w_3 = 0), gates follow, zero-pad
        to the subgroup size.
        """
        num_pub = len(self.public_inputs)
        size = self.subgroup_size()
        pubvals = [self.get_variable(i) for i in self.public_inputs]
        pad = size - self.n - num_pub

        def build(wlist, include_pub):
            vals = (pubvals if include_pub else [0] * num_pub) + [
                self.get_variable(w) for w in wlist
            ] + [0] * pad
            return ints_to_mont(vals)

        return {
            "w_1": build(self.w_l, True),
            "w_2": build(self.w_r, True),
            "w_3": build(self.w_o, False),
        }, pubvals

    def compute_verification_key(self) -> VerificationKey:
        if self._vk is not None:
            return self._vk
        pk = self.compute_proving_key()
        comms = {}
        for info in self.settings.polynomial_manifest:
            if info.source == "selector":
                comms[info.commitment_label] = pk.commit(
                    pk.selectors[info.polynomial_label].monomial
                )
            elif info.source == "permutation":
                comms[info.commitment_label] = pk.commit(
                    pk.sigmas[info.polynomial_label].monomial
                )
        vsrs = self.crs_factory.get_verifier_srs()
        rec = self.recursive_proof_public_input_indices
        self._vk = VerificationKey(
            n=pk.n,
            num_public_inputs=pk.num_public_inputs,
            commitments=comms,
            domain_root=pk.small_domain.root,
            g2_x=vsrs.g2_x,
            settings=self.settings,
            contains_recursive_proof=rec is not None,
            recursive_proof_public_input_indices=rec,
        )
        return self._vk

    def _flavor(self):
        from .flavors import StandardFlavor

        return StandardFlavor

    def _unrolled_flavor(self):
        from .flavors import UnrolledStandardFlavor

        return UnrolledStandardFlavor

    def create_prover(self):
        from .prover import Prover

        pk = self.compute_proving_key()
        wires, pubvals = self.compute_witness()
        return Prover(pk, wires, pubvals, self._flavor())

    def create_verifier(self):
        from .verifier import Verifier

        return Verifier(self.compute_verification_key(), self._flavor())

    def create_unrolled_prover(self):
        """Prover for in-circuit recursive verification
        (ref: standard_composer.cpp create_unrolled_prover)."""
        from .prover import Prover

        pk = self.compute_proving_key()
        wires, pubvals = self.compute_witness()
        return Prover(pk, wires, pubvals, self._unrolled_flavor())

    def create_unrolled_verifier(self):
        from .verifier import Verifier

        return Verifier(self.compute_verification_key(), self._unrolled_flavor())


class TurboComposer(ComposerBase):
    """Width-4 composer with custom gates
    (ref: plonk/composer/turbo_composer.cpp:42-700)."""

    SELECTORS = ("q_m", "q_c", "q_1", "q_2", "q_3", "q_4", "q_5",
                 "q_arith", "q_ecc_1", "q_range", "q_logic")

    def __init__(self, crs_factory=None, settings=TURBO):
        super().__init__()
        self.settings = settings
        self.crs_factory = crs_factory or FakeReferenceStringFactory()
        self.w_l: List[int] = []
        self.w_r: List[int] = []
        self.w_o: List[int] = []
        self.w_4: List[int] = []
        for s in self.SELECTORS:
            setattr(self, s, [])
        self.constant_variables: Dict[int, int] = {}
        self.zero_idx = self.put_constant_variable(0)
        self._pk: Optional[ProvingKey] = None
        self._vk: Optional[VerificationKey] = None

    def _wire_lists(self):
        return (self.w_l, self.w_r, self.w_o, self.w_4)

    def _flavor(self):
        from .flavors import TurboFlavor

        return TurboFlavor

    def _unrolled_flavor(self):
        from .flavors import UnrolledTurboFlavor

        return UnrolledTurboFlavor

    create_unrolled_prover = StandardComposer.create_unrolled_prover
    create_unrolled_verifier = StandardComposer.create_unrolled_verifier

    # -- gate recording --------------------------------------------------------
    def _push(self, a, b, c, d, **sel):
        self.w_l.append(a)
        self.w_r.append(b)
        self.w_o.append(c)
        self.w_4.append(d)
        for s in self.SELECTORS:
            getattr(self, s).append(sel.get(s, 0) % FR_MOD)
        self.n += 1

    def create_dummy_gate(self):
        """All-zero-selector gate with a nonzero wire value
        (ref: turbo_composer.cpp:72-92)."""
        idx = self.add_variable((1 << 64) + 1)
        self._push(idx, idx, idx, idx)

    def create_add_gate(self, t: AddTriple):
        self._push(t.a, t.b, t.c, self.zero_idx, q_1=t.a_scaling,
                   q_2=t.b_scaling, q_3=t.c_scaling, q_c=t.const_scaling,
                   q_arith=1)

    def create_big_add_gate(self, a, b, c, d, a_s, b_s, c_s, d_s, const_s,
                            q_arith=1):
        self._push(a, b, c, d, q_1=a_s, q_2=b_s, q_3=c_s, q_4=d_s,
                   q_c=const_s, q_arith=q_arith)

    def create_big_add_gate_with_bit_extraction(self, a, b, c, d, a_s, b_s,
                                                c_s, d_s, const_s):
        self.create_big_add_gate(a, b, c, d, a_s, b_s, c_s, d_s, const_s,
                                 q_arith=2)

    def create_big_mul_gate(self, a, b, c, d, mul_s, a_s, b_s, c_s, d_s,
                            const_s):
        self._push(a, b, c, d, q_m=mul_s, q_1=a_s, q_2=b_s, q_3=c_s, q_4=d_s,
                   q_c=const_s, q_arith=1)

    def create_balanced_add_gate(self, a, b, c, d, a_s, b_s, c_s, d_s,
                                 const_s):
        """Width-4 add where d must be in [0,3] (q_5 activates the range
        term in the turbo arithmetic kernel)."""
        self._push(a, b, c, d, q_1=a_s, q_2=b_s, q_3=c_s, q_4=d_s,
                   q_5=1, q_c=const_s, q_arith=1)

    def create_mul_gate(self, t: MulTriple):
        self._push(t.a, t.b, t.c, self.zero_idx, q_m=t.mul_scaling,
                   q_3=t.c_scaling, q_c=t.const_scaling, q_arith=1)

    def create_bool_gate(self, a: int):
        self._push(a, a, a, self.zero_idx, q_m=1, q_3=-1, q_arith=1)

    def create_poly_gate(self, t: PolyTriple):
        self._push(t.a, t.b, t.c, self.zero_idx, q_m=t.q_m, q_1=t.q_l,
                   q_2=t.q_r, q_3=t.q_o, q_c=t.q_c, q_arith=1)

    def create_fixed_group_add_gate(self, a, b, c, d, q_x_1, q_x_2, q_y_1,
                                    q_y_2):
        """Grumpkin 2-bit fixed-base ladder add
        (ref: turbo_composer.cpp:269-290)."""
        self._push(a, b, c, d, q_1=q_x_1, q_2=q_x_2, q_3=q_y_1,
                   q_ecc_1=q_y_2)

    def create_fixed_group_add_gate_with_init(self, a, b, c, d, q_x_1, q_x_2,
                                              q_y_1, q_y_2, i_x_1, i_x_2,
                                              i_y_1, i_y_2):
        self._push(a, b, c, d, q_1=q_x_1, q_2=q_x_2, q_3=q_y_1,
                   q_ecc_1=q_y_2, q_4=i_x_1, q_5=i_x_2, q_m=i_y_1,
                   q_c=i_y_2)

    def fix_witness(self, witness_index: int, value: int):
        z = getattr(self, "zero_idx", 0)
        self._push(witness_index, z, z, z, q_1=1, q_c=-value, q_arith=1)

    def put_constant_variable(self, value: int) -> int:
        value %= FR_MOD
        if value in self.constant_variables:
            return self.constant_variables[value]
        idx = self.add_variable(value)
        self.fix_witness(idx, value)
        self.constant_variables[value] = idx
        return idx

    # -- accumulator constraints -------------------------------------------------
    def create_range_constraint(self, witness_index: int, num_bits: int):
        """Base-4 accumulator range check, (bits/8) gates
        (ref: turbo_composer.cpp:337-478)."""
        value = self.get_variable(witness_index)
        num_quad_gates = num_bits >> 3
        if (num_quad_gates << 3) != num_bits:
            num_quad_gates += 1
        num_quads = num_quad_gates << 2
        forced_zero_threshold = 1 + (((num_quads << 1) - num_bits) >> 1)

        wires = (self.w_4, self.w_o, self.w_r, self.w_l)
        accumulators = []
        accumulator = 0
        most_significant_segment = 0
        for i in range(num_quads + 1):
            if i < forced_zero_threshold:
                accumulator_index = self.zero_idx
            else:
                bit_index = (num_quads - i) << 1
                quad = ((value >> bit_index) & 1) + 2 * ((value >> (bit_index + 1)) & 1)
                accumulator = (4 * accumulator + quad) % FR_MOD
                accumulator_index = self.add_variable(accumulator)
                accumulators.append(accumulator_index)
                if i == forced_zero_threshold:
                    most_significant_segment = accumulator_index
            wires[i & 3].append(accumulator_index)

        used_gates = (num_quads + 1 + 3) // 4
        for i in range(used_gates):
            q_r = 1 if i < used_gates - 1 else 0
            for s in self.SELECTORS:
                getattr(self, s).append(q_r if s == "q_range" else 0)
        self.w_l.append(self.zero_idx)
        self.w_r.append(self.zero_idx)
        self.w_o.append(self.zero_idx)

        self.assert_equal(witness_index, accumulators[-1],
                          "range constraint value mismatch")
        accumulators[-1] = witness_index
        self.n += used_gates

        if num_bits & 1:
            self.create_bool_gate(most_significant_segment)
        return accumulators

    def create_logic_constraint(self, a: int, b: int, num_bits: int,
                                is_xor: bool):
        """Quad-accumulator AND/XOR, (bits/2)+1 gates
        (ref: turbo_composer.cpp:480-654)."""
        assert num_bits % 2 == 0
        left_val = self.get_variable(a)
        right_val = self.get_variable(b)
        num_quads = num_bits >> 1

        out = {"left": [], "right": [], "out": []}
        left_acc = right_acc = out_acc = 0

        self.w_l.append(self.zero_idx)
        self.w_r.append(self.zero_idx)
        self.w_4.append(self.zero_idx)
        for i in range(num_quads):
            bit_index = (num_quads - 1 - i) << 1
            lq = ((left_val >> bit_index) & 1) + 2 * ((left_val >> (bit_index + 1)) & 1)
            rq = ((right_val >> bit_index) & 1) + 2 * ((right_val >> (bit_index + 1)) & 1)
            oq = (lq ^ rq) if is_xor else (lq & rq)
            left_acc = (4 * left_acc + lq) % FR_MOD
            right_acc = (4 * right_acc + rq) % FR_MOD
            out_acc = (4 * out_acc + oq) % FR_MOD
            li = self.add_variable(left_acc)
            ri = self.add_variable(right_acc)
            oi = self.add_variable(out_acc)
            pi = self.add_variable(lq * rq)
            out["left"].append(li)
            out["right"].append(ri)
            out["out"].append(oi)
            self.w_l.append(li)
            self.w_r.append(ri)
            self.w_4.append(oi)
            self.w_o.append(pi)
        self.w_o.append(self.zero_idx)

        qc_val = (-1 if is_xor else 1) % FR_MOD
        for i in range(num_quads + 1):
            last = i == num_quads
            for s in self.SELECTORS:
                if s in ("q_c", "q_logic") and not last:
                    getattr(self, s).append(qc_val if s == "q_c" else qc_val)
                else:
                    getattr(self, s).append(0)
        self.assert_equal(out["left"][-1], a, "logic constraint left mismatch")
        out["left"][-1] = a
        self.assert_equal(out["right"][-1], b, "logic constraint right mismatch")
        out["right"][-1] = b
        self.n += num_quads + 1
        return out

    def create_and_constraint(self, a, b, num_bits):
        return self.create_logic_constraint(a, b, num_bits, False)

    def create_xor_constraint(self, a, b, num_bits):
        return self.create_logic_constraint(a, b, num_bits, True)

    # -- keys ------------------------------------------------------------------
    subgroup_size = StandardComposer.subgroup_size
    compute_verification_key = StandardComposer.compute_verification_key
    create_prover = StandardComposer.create_prover
    create_verifier = StandardComposer.create_verifier

    def compute_proving_key(self) -> ProvingKey:
        if self._pk is not None:
            return self._pk
        self.create_dummy_gate()  # ref: turbo_composer.cpp:684
        num_pub = len(self.public_inputs)
        size = self.subgroup_size()
        srs = self.crs_factory.get_prover_srs(size + 1)
        pk = ProvingKey(size, num_pub, srs, self.settings)
        for name in self.SELECTORS:
            coeffs = getattr(self, name)
            padded = (
                [0] * num_pub + list(coeffs)
                + [0] * (size - 1 - self.n - num_pub) + [1]
            )
            pk.add_polynomial("selector", name, ints_to_mont(padded))
        next_rows, factor_idx = self.compute_sigma_mappings(size, 4)
        for i in range(4):
            lag = kernels.sigma_from_mapping(
                jnp.asarray(next_rows[i]), jnp.asarray(factor_idx[i]),
                pk.omega_pows, size,
            )
            pk.add_polynomial("permutation", f"sigma_{i+1}", lag,
                              keep_lagrange=True)
        self._pk = pk
        return pk

    def compute_witness(self):
        num_pub = len(self.public_inputs)
        size = self.subgroup_size()
        pubvals = [self.get_variable(i) for i in self.public_inputs]
        pad = size - self.n - num_pub

        def build(wlist, include_pub):
            vals = (pubvals if include_pub else [0] * num_pub) + [
                self.get_variable(w) for w in wlist
            ] + [0] * pad
            return ints_to_mont(vals)

        return {
            "w_1": build(self.w_l, True),
            "w_2": build(self.w_r, True),
            "w_3": build(self.w_o, False),
            "w_4": build(self.w_4, False),
        }, pubvals


class UltraComposer(TurboComposer):
    """UltraPlonk composer: the turbo gate set + plookup lookup gates
    (docs/ULTRA_DESIGN.md; ref design: barretenberg/lookup_tables.md,
    polynomial_manifest.hpp:23-46 reserved slots).

    A lookup gate places (key1, key2, value) on w_1..w_3 with q_lookup = 1
    and q_index = the table index; the proving key carries the table columns
    as table_1..4 plus q_lookup/q_index, and the prover adds the sorted-list
    halves S_1/S_2 and the Z_LOOKUP grand product (flavors.UltraFlavor).
    """

    SELECTORS = TurboComposer.SELECTORS + ("q_lookup", "q_index")

    def __init__(self, crs_factory=None, settings=ULTRA):
        super().__init__(crs_factory, settings)
        self.tables: Dict[int, object] = {}
        self._lookups: List[tuple] = []

    def _flavor(self):
        from .flavors import UltraFlavor

        return UltraFlavor

    def _unrolled_flavor(self):
        from .flavors import UnrolledUltraFlavor

        return UnrolledUltraFlavor

    # -- tables / lookup gates -------------------------------------------------
    def add_lookup_table(self, table) -> None:
        if table.index in self.tables:
            assert self.tables[table.index] is table
            return
        self.tables[table.index] = table

    def create_lookup_gate(self, a: int, b: int, c: int, table_index: int):
        """Constrain (w(a), w(b), w(c)) to be a row of the table."""
        assert table_index in self.tables, "register the table first"
        self._push(a, b, c, self.zero_idx, q_lookup=1, q_index=table_index)
        self._lookups.append(
            (self.get_variable(a), self.get_variable(b), self.get_variable(c),
             table_index)
        )

    def read_from_table(self, table_index: int, a: int, b: int = None) -> int:
        """Witness the table value for keys (w(a), w(b)) and add the lookup
        gate; returns the value's witness index."""
        table = self.tables[table_index]
        k1 = self.get_variable(a)
        k2 = self.get_variable(b) if b is not None else 0
        row = next(
            (r for r in table.rows if r[0] == k1 and r[1] == k2), None
        )
        if row is None:
            if not self.failed:
                self.failed = True
                self.err = f"lookup ({k1},{k2}) not in table {table_index}"
            row = table.rows[0]
        c = self.add_variable(row[2])
        if b is None:
            b = self.zero_idx
        self.create_lookup_gate(a, b, c, table_index)
        return c

    def create_range_constraint_via_lookup(self, witness_index: int,
                                           table_index: int,
                                           num_chunks: int,
                                           chunk_bits: int):
        """Range-constrain to num_chunks * chunk_bits bits with one lookup
        row per chunk + a recomposition gate chain (vs one turbo gate per
        8 bits)."""
        value = self.get_variable(witness_index)
        base = 1 << chunk_bits
        chunks = [(value >> (chunk_bits * i)) & (base - 1)
                  for i in range(num_chunks)]
        acc_idx = None
        acc_val = 0
        for i in reversed(range(num_chunks)):
            ci = self.add_variable(chunks[i])
            self.create_lookup_gate(ci, self.zero_idx, self.zero_idx,
                                    table_index)
            if acc_idx is None:
                acc_idx, acc_val = ci, chunks[i]
            else:
                new_val = (acc_val * base + chunks[i]) % FR_MOD
                new_idx = self.add_variable(new_val)
                self.create_add_gate(AddTriple(
                    acc_idx, ci, new_idx, base, 1, -1, 0))
                acc_idx, acc_val = new_idx, new_val
        self.assert_equal(acc_idx, witness_index, "range lookup mismatch")
        return acc_idx

    # -- keys ------------------------------------------------------------------
    def _table_size(self) -> int:
        return sum(len(t.rows) for t in self.tables.values())

    def subgroup_size(self) -> int:
        total = self.n + len(self.public_inputs)
        # the sorted list needs #lookups + table rows + zeros to fit 2m+1
        need = max(total + NUM_RESERVED_GATES,
                   self._table_size() + NUM_RESERVED_GATES)
        return _next_pow2(need)

    def compute_proving_key(self) -> ProvingKey:
        if self._pk is not None:
            return self._pk
        pk = super().compute_proving_key()
        size = pk.n
        assert self._table_size() <= size - NUM_RESERVED_GATES, \
            "table content exceeds circuit capacity"

        # table column polynomials (content rows first, zero padding after —
        # the same order build_sorted_halves assumes)
        cols = [[], [], [], []]
        for idx in sorted(self.tables):
            for k1, k2, v in self.tables[idx].rows:
                cols[0].append(k1)
                cols[1].append(k2)
                cols[2].append(v)
                cols[3].append(idx)
        pad = size - len(cols[0])
        for i in range(4):
            cols[i] = cols[i] + [0] * pad
            pk.add_polynomial("selector", f"table_{i+1}",
                              ints_to_mont(cols[i]), keep_lagrange=True)
        # the z_lookup kernel needs these in lagrange form too
        for name in ("q_lookup", "q_index"):
            store = pk.selectors[name]
            if store.lagrange is None:
                from ..poly import fft_ops as pfft

                store.lagrange = pfft.fft(store.monomial, pk.small_domain)
        return pk

    def create_prover(self):
        from .prover import Prover

        pk = self.compute_proving_key()
        wires, pubvals = self.compute_witness()
        aux = {"tables": list(self.tables.values()), "lookups": self._lookups}
        return Prover(pk, wires, pubvals, self._flavor(), aux=aux)

    def create_unrolled_prover(self):
        """Recursion-friendly prover: identical polynomial work, Pedersen+
        Blake2s transcript (flavors.UnrolledUltraFlavor)."""
        from .prover import Prover

        pk = self.compute_proving_key()
        wires, pubvals = self.compute_witness()
        aux = {"tables": list(self.tables.values()), "lookups": self._lookups}
        return Prover(pk, wires, pubvals, self._unrolled_flavor(), aux=aux)


class MiMCComposer(StandardComposer):
    """Standard composer + the MiMC x^7 block-cipher gate
    (ref: plonk/composer/mimc_composer.cpp).

    A mimc gate at row i encodes one cipher round
    x_out = (x_in + k + c_i)^7 as: w_1 = k, w_2 = x_cubed, w_3 = x_in,
    q_mimc_coefficient = c_i, with x_out read from w_3 of row i+1 (the
    widget's w_3_omega shift) — so consecutive mimc gates chain for free,
    and a pending x_out is flushed into a noop row whenever a non-mimc
    gate follows (mimc_composer.cpp:23-116)."""

    def __init__(self, crs_factory=None, settings=None):
        from .manifests import MIMC

        # set first: the base __init__ seeds constant-0 via the overridden
        # _push path
        self.q_mimc_coefficient: List[int] = []
        self.q_mimc_selector: List[int] = []
        self.current_output_wire: Optional[int] = None
        super().__init__(crs_factory, settings or MIMC)

    def _push(self, a, b, c, qm, q1, q2, q3, qc):
        # any standard gate first flushes a pending mimc output row
        self._flush_mimc()
        super()._push(a, b, c, qm, q1, q2, q3, qc)
        self.q_mimc_coefficient.append(0)
        self.q_mimc_selector.append(0)

    def _flush_mimc(self):
        if self.current_output_wire is None:
            return
        out = self.current_output_wire
        self.current_output_wire = None
        # noop row carrying x_out in w_3 (mimc_composer.cpp:94-116)
        super()._push(self.zero_idx, self.zero_idx, out, 0, 0, 0, 0, 0)
        self.q_mimc_coefficient.append(0)
        self.q_mimc_selector.append(0)

    def create_mimc_gate(self, x_in_idx: int, x_cubed_idx: int, k_idx: int,
                         x_out_idx: int, mimc_constant: int):
        if (self.current_output_wire is not None
                and x_in_idx != self.current_output_wire):
            self._flush_mimc()
        self.current_output_wire = None
        self.w_l.append(k_idx)
        self.w_r.append(x_cubed_idx)
        self.w_o.append(x_in_idx)
        self.q_m.append(0)
        self.q_1.append(0)
        self.q_2.append(0)
        self.q_3.append(0)
        self.q_c.append(0)
        self.q_mimc_coefficient.append(mimc_constant % FR_MOD)
        self.q_mimc_selector.append(1)
        self.n += 1
        self.current_output_wire = x_out_idx

    def create_dummy_gates(self):
        """Non-zero/non-identical selector rows (mimc_composer.cpp:118-155)."""
        self._flush_mimc()
        # the base rows go through the overridden _push, which already
        # zero-pads the mimc selectors
        super().create_dummy_gates()
        # q_mimc_selector = 1 row over zero wires (satisfied: next row w_3=0)
        super()._push(self.zero_idx, self.zero_idx, self.zero_idx,
                      0, 0, 0, 0, 0)
        self.q_mimc_coefficient.append(0)
        self.q_mimc_selector.append(1)
        super()._push(self.zero_idx, self.zero_idx, self.zero_idx,
                      0, 0, 0, 0, 0)
        self.q_mimc_coefficient.append(1)
        self.q_mimc_selector.append(0)

    def compute_proving_key(self) -> ProvingKey:
        if self._pk is not None:
            return self._pk
        self._flush_mimc()
        num_pub = len(self.public_inputs)
        size = self.subgroup_size()
        srs = self.crs_factory.get_prover_srs(size + 1)
        pk = ProvingKey(size, num_pub, srs, self.settings)
        for name, coeffs in (
            ("q_m", self.q_m), ("q_c", self.q_c), ("q_1", self.q_1),
            ("q_2", self.q_2), ("q_3", self.q_3),
            ("q_mimc_coefficient", self.q_mimc_coefficient),
            ("q_mimc_selector", self.q_mimc_selector),
        ):
            padded = (
                [0] * num_pub + list(coeffs)
                + [0] * (size - 1 - self.n - num_pub) + [1]
            )
            pk.add_polynomial("selector", name, ints_to_mont(padded))
        next_rows, factor_idx = self.compute_sigma_mappings(size, 3)
        for i in range(3):
            lag = kernels.sigma_from_mapping(
                jnp.asarray(next_rows[i]), jnp.asarray(factor_idx[i]),
                pk.omega_pows, size,
            )
            pk.add_polynomial("permutation", f"sigma_{i+1}", lag,
                              keep_lagrange=True)
        self._pk = pk
        return pk

    def compute_witness(self):
        self._flush_mimc()
        return super().compute_witness()

    def _flavor(self):
        from .flavors import MimcFlavor

        return MimcFlavor

    def _unrolled_flavor(self):
        raise NotImplementedError("mimc composer has no unrolled settings "
                                  "(matches the reference)")
