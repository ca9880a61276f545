from .keccak import keccak256, keccak256_hex  # noqa: F401
