"""Generate long-arm KUKA URDFs (model_<n>.urdf; reference:
environment/kuka_generate_urdf.py).

Instead of the reference's string-template blocks, this rebuilds the file
structurally from model_0.urdf with ElementTree: between link_4 and link_5
it splices n repeated elbow segments — each a (joint, link_3-like) pair
followed by a (joint, link_4-like) pair, exactly the geometry model_3.urdf
ships with (13 joints for n=3).

Usage: python tools/kuka_generate_urdf.py <n_blocks>
"""

from __future__ import annotations

import copy
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BASE = REPO / "assets" / "kuka_iiwa" / "model_0.urdf"


def _find_link(root, name):
    for l in root.findall("link"):
        if l.get("name") == name:
            return l
    raise KeyError(name)


def _find_joint(root, name):
    for j in root.findall("joint"):
        if j.get("name") == name:
            return j
    raise KeyError(name)


def generate(n_blocks: int) -> Path:
    tree = ET.parse(str(BASE))
    root = tree.getroot()

    link3 = _find_link(root, "lbr_iiwa_link_3")
    link4 = _find_link(root, "lbr_iiwa_link_4")
    joint5 = _find_joint(root, "lbr_iiwa_joint_5")

    children = list(root)
    insert_at = children.index(joint5)

    new_elems = []
    prev_link = "lbr_iiwa_link_4"
    next_id = 8
    for b in range(n_blocks):
        # elbow joint + link_3-like segment
        j_a = ET.Element("joint", name=f"lbr_iiwa_joint{next_id}", type="revolute")
        ET.SubElement(j_a, "parent", link=prev_link)
        ET.SubElement(j_a, "child", link=f"lbr_iiwa_link_{next_id}")
        ET.SubElement(j_a, "origin", rpy="1.57079632679 0 3.14159265359", xyz="0 0.1845 0")
        ET.SubElement(j_a, "axis", xyz="0 0 1")
        ET.SubElement(
            j_a, "limit", effort="300", lower="-2.96705972839", upper="2.96705972839", velocity="10"
        )
        l_a = copy.deepcopy(link3)
        l_a.set("name", f"lbr_iiwa_link_{next_id}")

        # wrist joint + link_4-like segment
        j_b = ET.Element("joint", name=f"lbr_iiwa_joint_{next_id + 1}", type="revolute")
        ET.SubElement(j_b, "parent", link=f"lbr_iiwa_link_{next_id}")
        ET.SubElement(j_b, "child", link=f"lbr_iiwa_link_{next_id + 1}")
        ET.SubElement(j_b, "origin", rpy="1.57079632679 0 0", xyz="0 0 0.2155")
        ET.SubElement(j_b, "axis", xyz="0 0 1")
        ET.SubElement(
            j_b, "limit", effort="300", lower="-2.09439510239", upper="2.09439510239", velocity="10"
        )
        l_b = copy.deepcopy(link4)
        l_b.set("name", f"lbr_iiwa_link_{next_id + 1}")

        new_elems.extend([j_a, l_a, j_b, l_b])
        prev_link = f"lbr_iiwa_link_{next_id + 1}"
        next_id += 2

    # re-home joint_5 onto the last inserted link
    joint5.find("parent").set("link", prev_link)

    for i, el in enumerate(new_elems):
        root.insert(insert_at + i, el)

    out = REPO / "assets" / "kuka_iiwa" / f"model_{n_blocks}.urdf"
    tree.write(str(out))
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    generate(int(sys.argv[1]))
