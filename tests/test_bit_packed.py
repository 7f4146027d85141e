"""bit_array + packed_byte_array tests
(ref: stdlib/primitives/bit_array/bit_array.test.cpp,
packed_byte_array/packed_byte_array.test.cpp)."""

from aztec_tpu.plonk.circuit_check import check_turbo
from aztec_tpu.plonk.composer import TurboComposer
from aztec_tpu.stdlib.bit_array import BitArray
from aztec_tpu.stdlib.byte_array import field_to_bytes
from aztec_tpu.stdlib.field_t import FieldT
from aztec_tpu.stdlib.packed_byte_array import PackedByteArray
from aztec_tpu.stdlib.uint32 import UInt32


def test_bit_array_from_bytes_roundtrip():
    c = TurboComposer()
    data = b"\xde\xad\xbe\xef\x01\x02\x03\x80"
    ba = BitArray.from_bytes(c, data)
    assert len(ba) == 64
    assert ba.to_bytes_value() == data
    assert check_turbo(c) == []


def test_bit_array_uint32_roundtrip():
    c = TurboComposer()
    w1 = UInt32.from_witness(c, 0xCAFEBABE)
    w2 = UInt32.from_witness(c, 0x01020304)
    ba = BitArray.from_uint32s(c, [w1, w2])
    assert len(ba) == 64
    assert ba.get_value() == (0xCAFEBABE << 32) | 0x01020304
    words = ba.to_uint32s()
    assert [w.get_value() for w in words] == [0xCAFEBABE, 0x01020304]
    assert check_turbo(c) == []


def test_bit_array_from_byte_array_binds():
    c = TurboComposer()
    v = 0x1122334455667788
    f = FieldT.from_witness(c, v)
    byte_fs = field_to_bytes(f, 8)
    ba = BitArray.from_byte_array(c, byte_fs)
    assert ba.get_value() == v
    assert check_turbo(c) == []
    # tamper with a bit witness -> unsatisfied circuit
    b0 = ba[0]
    c.variables[b0.witness_index] = 1 - c.variables[b0.witness_index]
    assert check_turbo(c) != []


def test_packed_byte_array_pack_unpack():
    c = TurboComposer()
    data = bytes(range(1, 41))  # 40 bytes = 2.5 limbs
    pba = PackedByteArray.from_bytes(c, data)
    assert pba.size() == 40
    assert pba.get_value() == data
    assert len(pba.get_limbs()) == 3


def test_packed_byte_array_append():
    c = TurboComposer()
    pba = PackedByteArray.from_bytes(c, b"\xaa" * 14)
    # fits in the trailing limb's free bytes
    pba.append(FieldT.from_witness(c, 0x0102), 2)
    assert pba.get_value() == b"\xaa" * 14 + b"\x01\x02"
    # split across the limb boundary
    pba.append(FieldT.from_witness(c, int.from_bytes(b"XYZ", "big")), 3)
    assert pba.get_value() == b"\xaa" * 14 + b"\x01\x02" + b"XYZ"
    assert check_turbo(c) == []


def test_packed_byte_array_from_field_slices_and_reslice():
    c = TurboComposer()
    vals = [0x11223344, 0xAABBCCDD, 0x01020304, 0x05060708]
    fs = [FieldT.from_witness(c, v) for v in vals]
    pba = PackedByteArray.from_field_slices(c, fs, bytes_per_input=4)
    assert pba.size() == 16
    expect = b"".join(v.to_bytes(4, "big") for v in vals)
    assert pba.get_value() == expect
    slices = pba.to_unverified_byte_slices(4)
    assert [s.get_value() for s in slices] == vals
    assert check_turbo(c) == []
