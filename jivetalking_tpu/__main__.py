"""python -m jivetalking_tpu — the CLI entry point."""

import sys

from .cli.main import main

sys.exit(main())
