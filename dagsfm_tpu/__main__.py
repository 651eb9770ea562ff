"""`python -m dagsfm_tpu <subcommand>` — CLI entry point."""
from dagsfm_tpu.pipeline.cli import main

main()
