from .units import (
    db_to_linear,
    linear_to_db,
    sanitize_float,
    DB_FLOOR,
    LUFS_SILENCE_FLOOR,
)
