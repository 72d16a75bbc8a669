"""Command-line entry points:

* ``cli.train``          — fine-tuning (all loss/optimizer modes, any mesh)
* ``cli.evaluate``       — countbench | vlmsblind | crop subcommands
* ``cli.generate_data``  — synthetic counting dataset generation
* ``cli.download_coco``  — COCO 2017 fetch (network-gated)

Launch scripts with the reference's production configurations live in
``launch/`` (the SLURM-script layer, re-targeted at TPU VMs).
"""
