"""byte_array decomposition tests (ref: stdlib/primitives/byte_array)."""

from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.stdlib import witness
from aztec_tpu.stdlib.byte_array import field_to_bytes, bytes_to_uint32_words_le


def test_roundtrip_and_word_packing():
    v = 0x1122334455667788990011223344556677889900112233445566778899001122 % (
        2**254
    )
    c = TurboComposer()
    bs = field_to_bytes(witness(c, v), 32)
    assert bytes(b.get_value() for b in bs) == v.to_bytes(32, "big")
    words = bytes_to_uint32_words_le(bs)
    raw = v.to_bytes(32, "big")
    assert [w.get_value() for w in words] == [
        int.from_bytes(raw[4 * i : 4 * i + 4], "little") for i in range(8)
    ]
    assert check_turbo(c) == []
