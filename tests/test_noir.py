"""noir DSL tests (ref: noir/compiler tests + cli/test.noir shape):
parser coverage, codegen vs host-model semantics, gate satisfiability.
"""

from aztec_tpu.noir import compile_program, parse
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.plonk.composer import TurboComposer

MIX = """
uint32[4] round_keys = [0xdeadbeef, 0x01234567, 0x89abcdef, 0x42424242];

uint32 mix_one(uint32 x, uint32 k)
{
    uint32 a = x + k;
    uint32 b = a >>> 7 ^ a >>> 18 ^ (a >> 3);
    return b ^ (a << 2) ^ ~k;
}

uint32[2] main(uint32[2] input)
{
    uint32 s0 = input[0];
    uint32 s1 = input[1];
    for (i in 0..4) {
        uint32 t = mix_one(s0, round_keys[i]) + s1;
        s1 = s0;
        s0 = t;
    }
    return [s0, s1];
}
"""

M32 = 0xFFFFFFFF


def mix_model(inputs):
    keys = [0xDEADBEEF, 0x01234567, 0x89ABCDEF, 0x42424242]

    def ror(x, k):
        return ((x >> k) | (x << (32 - k))) & M32

    def mix_one(x, k):
        a = (x + k) & M32
        b = ror(a, 7) ^ ror(a, 18) ^ (a >> 3)
        return (b ^ ((a << 2) & M32) ^ (~k & M32)) & M32

    s0, s1 = inputs
    for i in range(4):
        t = (mix_one(s0, keys[i]) + s1) & M32
        s1, s0 = s0, t
    return [s0, s1]


def test_parse_shapes():
    prog = parse(MIX)
    assert prog[0] == "program"
    assert len(prog[1]) == 1        # one global
    assert len(prog[2]) == 2        # two functions
    # uint32[2] main(...)
    fn = [f for f in prog[2] if f[2] == "main"][0]
    assert fn[1] == ("type", "uint32", True, 2)


def test_noir_mix_matches_model_and_satisfies():
    c = TurboComposer()
    inputs = [0x11223344, 0x55667788]
    out = compile_program(c, MIX, [inputs])
    assert out.result == mix_model(inputs)
    assert c.n > 50  # real gates were emitted
    assert not c.failed
    assert check_turbo(c) == []


def test_noir_field_and_bool():
    src = """
field main(field x, field y, bool flip)
{
    field p = x * y + 7;
    if (true) { p = p + 1; }
    bool eq = p == p;
    return p * (x + y);
}
"""
    c = TurboComposer()
    out = compile_program(c, src, [3, 5, 1])
    assert out.result == (3 * 5 + 7 + 1) * (3 + 5)
    assert check_turbo(c) == []


def test_noir_uint_widths():
    src = """
uint8 main(uint8 a, uint8 b)
{
    uint8 c = a + b;
    return c ^ (a & b);
}
"""
    c = TurboComposer()
    out = compile_program(c, src, [200, 100])
    assert out.result == (((200 + 100) & 0xFF) ^ (200 & 100))
    assert check_turbo(c) == []


def test_noir_static_eval_in_indices():
    src = """
uint32 main(uint32[4] xs)
{
    uint32 acc = 0;
    for (i in 0..4) {
        acc = acc + xs[3 - i];
    }
    return acc;
}
"""
    c = TurboComposer()
    out = compile_program(c, src, [[1, 2, 3, 4]])
    assert out.result == 10
    assert check_turbo(c) == []
