from metaviterbinet_tpu.ecc.rs import (  # noqa: F401
    rs_encode_bits,
    rs_decode_bits,
    rs_encode_bytes,
    rs_decode_bytes,
    bits_to_bytes,
    bytes_to_bits,
)
