"""Blake2s R1CS circuit: the reference aggregation bench's proof workload
(/root/reference/benches/benches/groth16_aggregation/bench.rs:30-75 proves
knowledge of a Blake2s-PRF preimage per aggregated proof).

Statement: public = the 8 output words (u32, one field element each);
witness = the 32-byte input.  The circuit computes one Blake2s-256
compression of the 64-byte block [seed(=0^32) || input].  This is
bit-exact to the reference workload: ark-crypto-primitives' Blake2s PRF
is the UNKEYED hash of seed||input (update(seed); update(input) in
prf/blake2s, and the R1CS gadget concatenates the same way), and the
bench fixes seed = UInt8::constant_vec(&[0; 32]) (bench.rs:38).
blake2s_prf(input) == hashlib.blake2s(b"\\0"*32 + input).digest()
(asserted in tests/test_ntt_blake2s.py).

Gadget encoding (standard bit-decomposition style):
  * every u32 is 32 bit wires; bits are affine LinCombs so XOR with a
    constant side and NOT are free
  * XOR: c := a + b - 2ab  as the constraint (2a) * (b) = (a + b - c)
  * ADD mod 2^32 (2 or 3 operands): 32 result bits + 1-2 carry bits, all
    boolean-constrained, one linear binding constraint
  * rotations are rewirings (free)

~22k constraints for the full 10-round compression, matching the
arkworks gadget's scale; the NTT-domain QAP (groth16.py) handles it in
O(m log m).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .groth16 import LinComb, R1CS

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
)

MASK32 = 0xFFFFFFFF


# --------------------------------------------------------------------------
# reference compression (host; witness generation + expected outputs)
# --------------------------------------------------------------------------

def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & MASK32


def _g(v: List[int], a, b, c, d, x, y):
    v[a] = (v[a] + v[b] + x) & MASK32
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = (v[c] + v[d]) & MASK32
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = (v[a] + v[b] + y) & MASK32
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = (v[c] + v[d]) & MASK32
    v[b] = _rotr(v[b] ^ v[c], 7)


def blake2s_compress_block(msg_words: Sequence[int]) -> List[int]:
    """One-block Blake2s-256: h = IV ^ param(digest=32, fanout/depth=1),
    F(h, m, t=64, last) -> 8 output words."""
    h = list(IV)
    h[0] ^= 0x01010020
    v = h + list(IV)
    v[12] ^= 64          # t0 = 64 bytes processed
    v[14] ^= MASK32      # final-block flag
    for rnd in range(10):
        s = SIGMA[rnd]
        _g(v, 0, 4, 8, 12, msg_words[s[0]], msg_words[s[1]])
        _g(v, 1, 5, 9, 13, msg_words[s[2]], msg_words[s[3]])
        _g(v, 2, 6, 10, 14, msg_words[s[4]], msg_words[s[5]])
        _g(v, 3, 7, 11, 15, msg_words[s[6]], msg_words[s[7]])
        _g(v, 0, 5, 10, 15, msg_words[s[8]], msg_words[s[9]])
        _g(v, 1, 6, 11, 12, msg_words[s[10]], msg_words[s[11]])
        _g(v, 2, 7, 8, 13, msg_words[s[12]], msg_words[s[13]])
        _g(v, 3, 4, 9, 14, msg_words[s[14]], msg_words[s[15]])
    return [(h[i] ^ v[i] ^ v[i + 8]) & MASK32 for i in range(8)]


def blake2s_prf(input_words: Sequence[int]) -> List[int]:
    """PRF output words for an 8-word (32-byte) input, zero seed block."""
    return blake2s_compress_block([0] * 8 + list(input_words))


# --------------------------------------------------------------------------
# circuit builder
# --------------------------------------------------------------------------

Bit = Dict[int, int]  # affine LinComb


class _Builder:
    """R1CS builder with a witness-assignment trace.

    Variables: z = (1, out_0..out_7 [public], witness bits...).
    `alloc` registers a witness value; building and witnessing happen in
    one pass so the assignment is produced alongside the constraints.
    """

    def __init__(self, r: int, num_public: int = 8):
        self.r = r
        self.num_public = num_public
        self.pub_vals: List[int] = []
        self.wit_vals: List[int] = []
        self.constraints: List[Tuple[LinComb, LinComb, LinComb]] = []

    # var index helpers (publics come first after the constant)
    def _wit_index(self, k: int) -> int:
        return 1 + self.num_public + k

    def alloc(self, value: int) -> int:
        self.wit_vals.append(value % self.r)
        return self._wit_index(len(self.wit_vals) - 1)

    def enforce(self, a: LinComb, b: LinComb, c: LinComb):
        self.constraints.append((a, b, c))

    def eval_lc(self, lc: LinComb) -> int:
        z = self.assignment()
        return sum(co * z[i] for i, co in lc.items()) % self.r

    def assignment(self) -> List[int]:
        return [1] + self.pub_vals + self.wit_vals

    # --- bit/word gadgets ---------------------------------------------------
    def bit_value(self, bit: Bit) -> int:
        return self.eval_lc(bit)

    def alloc_bit(self, value: int) -> Bit:
        idx = self.alloc(value & 1)
        self.enforce({idx: 1}, {idx: 1}, {idx: 1})  # booleanity
        return {idx: 1}

    def const_word(self, value: int) -> List[Bit]:
        return [{0: (value >> i) & 1} for i in range(32)]

    def alloc_word(self, value: int) -> List[Bit]:
        return [self.alloc_bit((value >> i) & 1) for i in range(32)]

    @staticmethod
    def _is_const(bit: Bit) -> bool:
        return all(k == 0 for k in bit.keys())

    @staticmethod
    def _lc_add(a: Bit, b: Bit, ca=1, cb=1) -> Bit:
        out = dict()
        for k, v in a.items():
            out[k] = out.get(k, 0) + ca * v
        for k, v in b.items():
            out[k] = out.get(k, 0) + cb * v
        return {k: v for k, v in out.items() if v}

    def xor_bit(self, a: Bit, b: Bit) -> Bit:
        if self._is_const(a):
            av = a.get(0, 0) & 1
            return self._lc_add({0: av}, b, 1, 1 - 2 * av)  # av ^ b
        if self._is_const(b):
            return self.xor_bit(b, a)
        va, vb = self.bit_value(a), self.bit_value(b)
        c = self.alloc(va ^ vb)
        cbit = {c: 1}
        # (2a) * (b) = a + b - c
        two_a = {k: 2 * v for k, v in a.items()}
        self.enforce(two_a, b, self._lc_add(self._lc_add(a, b), cbit, 1, -1))
        return cbit

    def xor_word(self, a: List[Bit], b: List[Bit]) -> List[Bit]:
        return [self.xor_bit(x, y) for x, y in zip(a, b)]

    @staticmethod
    def rotr_word(a: List[Bit], n: int) -> List[Bit]:
        # bit i of result = bit (i + n) mod 32 of input (LSB-first lists)
        return [a[(i + n) % 32] for i in range(32)]

    def word_value(self, a: List[Bit]) -> int:
        return sum(self.bit_value(bit) << i for i, bit in enumerate(a))

    def add_words(self, words: List[List[Bit]]) -> List[Bit]:
        """Sum of 2 or 3 words mod 2^32."""
        k = len(words)
        assert k in (2, 3)
        total = sum(self.word_value(w) for w in words)
        out_val = total & MASK32
        carry = total >> 32  # < k
        out = [self.alloc_bit((out_val >> i) & 1) for i in range(32)]
        carries = [self.alloc_bit((carry >> i) & 1)
                   for i in range(1 if k == 2 else 2)]
        # sum_i 2^i * (sum_w w_i) == sum_i 2^i out_i + 2^32 c0 (+ 2^33 c1)
        lhs: Bit = {}
        for w in words:
            for i, bit in enumerate(w):
                lhs = self._lc_add(lhs, bit, 1, 1 << i)
        rhs: Bit = {}
        for i, bit in enumerate(out):
            rhs = self._lc_add(rhs, bit, 1, 1 << i)
        for j, cbit in enumerate(carries):
            rhs = self._lc_add(rhs, cbit, 1, 1 << (32 + j))
        self.enforce(lhs, {0: 1}, rhs)
        return out


def _add_compression(bld: "_Builder", input_words: Sequence[int],
                     pub_offset: int) -> None:
    """Append one Blake2s compression instance to the builder, binding
    its 8 output words to public variables pub_offset..pub_offset+7
    (whose values must already be present in bld.pub_vals)."""
    msg = [bld.const_word(0) for _ in range(8)]
    msg += [bld.alloc_word(w) for w in input_words]

    h = [bld.const_word(IV[0] ^ 0x01010020)]
    h += [bld.const_word(IV[i]) for i in range(1, 8)]
    v = list(h) + [bld.const_word(IV[i]) for i in range(8)]
    v[12] = bld.const_word(IV[4] ^ 64)
    v[14] = bld.const_word(IV[6] ^ MASK32)

    def g(a, b, c, d, x, y):
        v[a] = bld.add_words([v[a], v[b], msg[x]])
        v[d] = bld.rotr_word(bld.xor_word(v[d], v[a]), 16)
        v[c] = bld.add_words([v[c], v[d]])
        v[b] = bld.rotr_word(bld.xor_word(v[b], v[c]), 12)
        v[a] = bld.add_words([v[a], v[b], msg[y]])
        v[d] = bld.rotr_word(bld.xor_word(v[d], v[a]), 8)
        v[c] = bld.add_words([v[c], v[d]])
        v[b] = bld.rotr_word(bld.xor_word(v[b], v[c]), 7)

    for rnd in range(10):
        s = SIGMA[rnd]
        g(0, 4, 8, 12, s[0], s[1])
        g(1, 5, 9, 13, s[2], s[3])
        g(2, 6, 10, 14, s[4], s[5])
        g(3, 7, 11, 15, s[6], s[7])
        g(0, 5, 10, 15, s[8], s[9])
        g(1, 6, 11, 12, s[10], s[11])
        g(2, 7, 8, 13, s[12], s[13])
        g(3, 4, 9, 14, s[14], s[15])

    # output binding: sum 2^i out_bit_i == public word j
    for j in range(8):
        ob = bld.xor_word(bld.xor_word(h[j], v[j]), v[j + 8])
        lhs: Bit = {}
        for i, bit in enumerate(ob):
            lhs = bld._lc_add(lhs, bit, 1, 1 << i)
        bld.enforce(lhs, {0: 1}, {1 + pub_offset + j: 1})


def build_blake2s_circuit(r: int, input_words: Sequence[int]
                          ) -> Tuple[R1CS, List[int], List[int]]:
    """Build the circuit AND its satisfying assignment for the given
    8-word input.  Returns (cs, z, public_output_words)."""
    bld = _Builder(r)
    out_words = blake2s_prf(input_words)
    bld.pub_vals = [w % r for w in out_words]
    _add_compression(bld, input_words, 0)
    cs = R1CS(num_public=8, num_witness=len(bld.wit_vals),
              constraints=bld.constraints)
    z = bld.assignment()
    return cs, z, out_words


def build_blake2s_multi_circuit(r: int, inputs: Sequence[Sequence[int]]
                                ) -> Tuple[R1CS, List[int], List[List[int]]]:
    """The reference's `complete_circuit` aggregation baseline
    (/root/reference/benches/benches/groth16_aggregation/bench.rs:470-526):
    ALL n Blake2s-PRF evaluations proven inside ONE monolithic Groth16
    circuit (n independent compression instances sharing a constraint
    system; publics = the n*8 output words).  No in-circuit pairing
    gadgets are involved -- the point of the baseline is comparing one
    big SNARK against n aggregated small ones."""
    n = len(inputs)
    bld = _Builder(r, num_public=8 * n)
    outs = [blake2s_prf(iw) for iw in inputs]
    bld.pub_vals = [w % r for ow in outs for w in ow]
    for k, iw in enumerate(inputs):
        _add_compression(bld, iw, 8 * k)
    cs = R1CS(num_public=8 * n, num_witness=len(bld.wit_vals),
              constraints=bld.constraints)
    return cs, bld.assignment(), outs


def blake2s_assignment(cs_template: R1CS, r: int,
                       input_words: Sequence[int]) -> Tuple[List[int], List[int]]:
    """Re-witness the SAME circuit shape for a new input (the builder is
    deterministic in structure, so constraints are identical; only the
    assignment differs)."""
    cs, z, out = build_blake2s_circuit(r, input_words)
    assert len(cs.constraints) == len(cs_template.constraints)
    return z, out
