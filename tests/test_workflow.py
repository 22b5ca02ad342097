"""Structural checks of the Avamb Snakemake workflow (workflow_avamb/).

Snakemake is not installed in this environment, so these tests validate
the workflow file statically: every rule present, every CLI invocation it
shells out to resolvable against the repo's actual entry points, and the
config file consistent with the keys the workflow reads.
"""

import json
import re
import unittest
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SMK = REPO / "workflow_avamb" / "avamb.smk"
CONFIG = REPO / "workflow_avamb" / "config.json"


class TestWorkflowFile(unittest.TestCase):
    def setUp(self):
        self.text = SMK.read_text()

    def test_rules_present(self):
        rules = set(re.findall(r"^rule (\w+):", self.text, re.M))
        expected = {
            "all",
            "cat_contigs",
            "minimap_index",
            "minimap_map_sort",
            "run_avamb",
            "write_ensemble_bins",
            "checkm2",
            "merge_checkm2",
            "avamb_ensemble",
        }
        self.assertEqual(rules, expected)

    def test_scripts_exist(self):
        for script in re.findall(r"\{SRC\}/(\w+\.py)", self.text):
            self.assertTrue((REPO / "src" / script).exists(), script)

    def test_config_keys_covered(self):
        config = json.loads(CONFIG.read_text())
        read_keys = set(re.findall(r'config(?:\.get)?[\[(]\s*"(\w+)"', self.text))
        # every key the workflow reads with no default must be in the config
        required = set(re.findall(r'config\["(\w+)"\]', self.text))
        self.assertTrue(required <= set(config), required - set(config))
        # every config key must actually be read by the workflow
        self.assertTrue(set(config) <= read_keys, set(config) - read_keys)

    def test_subcommands_exist(self):
        "Each `python -m vamb_tpu <sub>` the workflow calls must parse."
        from vamb_tpu.__main__ import main

        for sub in re.findall(r"python -m vamb_tpu (\w+)", self.text):
            # parsing with no further args must fail with argparse's error
            # (unknown subcommands raise SystemExit too, but with the
            # 'invalid choice' message on stderr — assert via exit code 2
            # on missing required args rather than 'invalid choice')
            with self.assertRaises((SystemExit, ValueError, TypeError)):
                main([sub])

    def test_avamb_ensemble_flags_valid(self):
        "Flags the workflow passes to avamb_ensemble exist in the CLI."
        cli = (REPO / "vamb_tpu" / "__main__.py").read_text()
        for flag in re.findall(r"(--[a-z][a-z_-]*)", self.text):
            if flag in ("--cores", "--use-conda", "--configfile", "--force",
                        "--input", "--output-directory", "--threads",
                        "--extension"):
                continue  # snakemake / checkm2 flags
            self.assertIn(f'"{flag}"', cli, flag)


if __name__ == "__main__":
    unittest.main()
