"""XML provenance sidecars.

Port of src/utils/XMLUtils.py: ``XMLWriter`` appends an ``<AnalysisStep>``
node (code, input md5, settings, git/run info, runtime) to the input file's
XML sidecar and writes the result next to the output file (ref :8-87), keeping
the experiment's analysis-chain provenance format byte-compatible.
"""
from __future__ import annotations

import logging
import os
import sys
import xml.etree.ElementTree as ET
from ntpath import basename
from typing import Any, Dict, Optional

from waveformml_tpu.utils.util import get_file_md5, get_run_info

log = logging.getLogger(__name__)


def append_xml(in_path: str, out_path: str, append_dict: Dict[str, Any],
               parent: Optional[ET.Element] = None) -> None:
    """Append nodes described by a nested dict to an existing XML file
    (ref: XMLUtils.py:57-76). ``_PROP_`` entries become attributes."""
    if parent is None:
        tree = ET.parse(in_path)
        root = tree.getroot()
    else:
        root = parent
    for name, value in append_dict.items():
        if name == "_PROP_":
            for key, v in value.items():
                root.set(key, str(v))
            continue
        n = ET.Element(name)
        if isinstance(value, dict):
            append_xml(in_path, out_path, value, n)
        else:
            n.text = str(value)
        root.append(n)
    if parent is None:
        ET.indent(tree, space="    ")
        tree.write(out_path, xml_declaration=True)


class XMLWriter:
    """AnalysisStep provenance writer (ref: XMLUtils.py:8-53)."""

    def __init__(self):
        self.code = basename(str(sys.argv[0]))
        self.input_file = "UNKNOWN"
        self.output_file = "UNKNOWN"
        self.step_name = "UNKNOWN"
        self.step_settings: Dict[str, Any] = {}
        self.step_xml: Dict[str, Any] = {}

    def generate_step_xml(self, runtime: float) -> None:
        input_md5 = get_file_md5(self.input_file) \
            if os.path.exists(self.input_file) else "UNKNOWN"
        self.step_xml = {"AnalysisStep": {
            "_PROP_": {"code": self.code},
            "input": {"_PROP_": {"file": self.input_file, "md5": input_md5}},
            "output": {"_PROP_": {"file": self.output_file}},
            self.step_name: {"_PROP_": self.step_settings},
        }}
        for key, val in get_run_info().items():
            self.step_xml["AnalysisStep"]["_PROP_"][key] = val
        self.step_xml["AnalysisStep"]["_PROP_"]["dtime"] = str(int(runtime))

    def write_xml(self, out_path: str, runtime: float) -> None:
        self.generate_step_xml(runtime)
        if os.path.exists(self.input_file):
            append_xml(self.input_file, out_path, self.step_xml)
        else:
            log.warning("No input XML file %s found, writing standalone sidecar",
                        self.input_file)
            root = ET.Element("WaveformML")
            tree = ET.ElementTree(root)
            append_xml("", out_path, self.step_xml, parent=root)
            ET.indent(tree, space="    ")
            tree.write(out_path, xml_declaration=True)
