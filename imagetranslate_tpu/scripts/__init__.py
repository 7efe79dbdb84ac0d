"""Corpus-mining & utility CLI toolbox (reference: src/scripts, ~2.9k LoC of
offline, host-only helpers — SURVEY §2.10). Same argv contracts, first-party
reimplementations. Run as `python -m imagetranslate_tpu.scripts.<name> ...`."""
