from .keccak import keccak256
from .blake2s import blake2s
from .sha256 import sha256  # noqa: F401
