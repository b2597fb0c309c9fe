"""Path registry (parity with reference dir_definitions.py:3-12)."""
import os

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODE_DIR = os.path.join(ROOT_DIR, "metaviterbinet_tpu")
RESOURCES_DIR = os.path.join(ROOT_DIR, "resources")
RESULTS_DIR = os.path.join(ROOT_DIR, "results")
FIGURES_DIR = os.path.join(RESULTS_DIR, "figures")
WEIGHTS_DIR = os.path.join(RESULTS_DIR, "weights")
PLOTS_DIR = os.path.join(RESULTS_DIR, "plots")
COST2100_DIR = os.path.join(RESOURCES_DIR, "cost2100_channel")
CONFIG_PATH = os.path.join(CODE_DIR, "config.yaml")
