from metaviterbinet_tpu.native.rs import (  # noqa: F401
    native_available,
    rs_decode_bytes_batch,
    rs_encode_bytes_batch,
)
