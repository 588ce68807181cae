"""Command-line interface package (one module per subcommand family;
the usage overview lives in cli/parser.py, shown by --help).

Back-compat: every public entry that lived in the old single-module
`pinnfc_tpu/cli.py` is re-exported here, so `from pinnfc_tpu.cli
import main` (pyproject entry point) and the test helpers keep
working unchanged."""

from __future__ import annotations

from pinnfc_tpu.cli._common import (  # noqa: F401
    _campaign_from_args,
    _glitch_default,
    _print_ckpt_provenance,
    _print_lambda_table,
    _small_schedule,
    _streaming_conformal_calib,
    _train_config,
)
from pinnfc_tpu.cli.admin import cmd_bench, cmd_doctor, cmd_warmup  # noqa: F401
from pinnfc_tpu.cli.diagnose import (  # noqa: F401
    cmd_auc,
    cmd_compare,
    cmd_conformal,
    cmd_gmm,
    cmd_report,
    cmd_risk,
)
from pinnfc_tpu.cli.explain import (  # noqa: F401
    cmd_explain,
    cmd_identify,
    cmd_inspect,
    cmd_whatif,
)
from pinnfc_tpu.cli.export import cmd_export_model  # noqa: F401
from pinnfc_tpu.cli.parser import main  # noqa: F401
from pinnfc_tpu.cli.run_all import cmd_run_all  # noqa: F401
from pinnfc_tpu.cli.serve import cmd_monitor, cmd_serve  # noqa: F401
from pinnfc_tpu.cli.train import (  # noqa: F401
    cmd_ensemble,
    cmd_score,
    cmd_synth,
    cmd_train,
)
