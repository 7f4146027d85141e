from .reference_string import (
    ProverReferenceString,
    VerifierReferenceString,
    FakeReferenceStringFactory,
    FileReferenceStringFactory,
)
