from .keccak import keccak256
from .blake2s import blake2s
