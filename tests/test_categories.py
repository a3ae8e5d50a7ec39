"""Annotation-parser tests with synthetic COCO json / Flickr30kEntities files."""

import json
import os

from lrp_imagecaptioning_tpu.data.categories import (
    COCOCategory,
    Flickr30kCategory,
    parse_flickr_sentence,
)


def test_coco_category(tmp_path):
    data = {
        "images": [{"id": 7, "file_name": "a.jpg", "width": 448, "height": 224}],
        "categories": [{"id": 1, "name": "person"}, {"id": 18, "name": "dog"}],
        "annotations": [
            {"image_id": 7, "category_id": 1, "bbox": [10, 20, 30, 40]},
            {"image_id": 7, "category_id": 18, "bbox": [5, 5, 10, 10]},
            {"image_id": 7, "category_id": 1, "bbox": [100, 100, 20, 20]},
        ],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(data))
    cc = COCOCategory(str(p))
    entry = cc.filename_to_category["a.jpg"]
    assert entry["categories"] == {"person": "1", "dog": "18"}
    assert entry["bbox"]["1"] == [[10, 20, 40, 60], [100, 100, 120, 120]]
    assert entry["resize_ratio"] == (0.5, 1.0)


def test_parse_flickr_sentence():
    line = "[/EN#283585/people A man] is walking [/EN#283586/animals his dog] ."
    phrases = parse_flickr_sentence(line)
    assert phrases == [
        {"phrase_id": "283585", "phrase": "a man"},
        {"phrase_id": "283586", "phrase": "his dog"},
    ]


def test_flickr30k_category(tmp_path):
    sdir = tmp_path / "Sentences"
    adir = tmp_path / "Annotations"
    os.makedirs(sdir)
    os.makedirs(adir)
    (sdir / "list.txt").write_text("123.txt\n")
    (sdir / "123.txt").write_text("[/EN#1/people A man] with [/EN#2/animals a dog] .\n")
    (adir / "123.xml").write_text(
        """<annotation><size><width>448</width><height>448</height><depth>3</depth></size>
        <object><name>1</name><bndbox><xmin>1</xmin><ymin>2</ymin><xmax>3</xmax><ymax>4</ymax></bndbox></object>
        <object><name>2</name><name>9</name><bndbox><xmin>5</xmin><ymin>6</ymin><xmax>7</xmax><ymax>8</ymax></bndbox></object>
        </annotation>"""
    )
    fc = Flickr30kCategory(str(tmp_path))
    entry = fc.filename_to_category["123.jpg"]
    assert entry["categories"] == {"a man": "1", "a dog": "2"}
    assert entry["bbox"]["1"] == [[1, 2, 3, 4]]
    assert entry["bbox"]["2"] == [[5, 6, 7, 8]]
    assert entry["resize_ratio"] == (0.5, 0.5)
