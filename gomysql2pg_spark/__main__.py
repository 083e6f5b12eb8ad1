"""`python -m gomysql2pg_spark` — the reference's CLI entry point
(`/root/reference/main.go:7-9` -> cobra dispatch) on the Spark stack."""

import sys

from .cli import main

sys.exit(main())
