"""Dataset parser tests with synthetic corpus files (Flickr30k token format,
COCO annotation json, Karpathy split json)."""

import json
import os

from lrp_imagecaptioning_tpu.config import COCO2014Config, COCOConfig, FlickrConfig
from lrp_imagecaptioning_tpu.data.datasets import (
    COCODataset,
    COCODatasetKarpathy,
    Flickr30kDataset,
)


def test_flickr30k_parsing(tmp_path):
    root = tmp_path / "ds"
    (root / "Flickr30k_text").mkdir(parents=True)
    (root / "Flickr30k_text" / "Flickr30k.token").write_text(
        "1.jpg#0\tA dog Runs fast .\n"
        "1.jpg#1\tthe dog is running\n"
        "2.jpg#0\tA cat sits.\n"
        "3.jpg#0\tsomething else\n"
    )
    (root / "Flickr30k_text" / "Flickr_30k.trainImages.txt").write_text("1.jpg\n")
    (root / "Flickr30k_text" / "Flickr_30k.devImages.txt").write_text("2.jpg\n")
    (root / "Flickr30k_text" / "Flickr_30k.testImages.txt").write_text("3.jpg\n")
    cfg = FlickrConfig(dataset_root=str(root))
    ds = Flickr30kDataset(cfg, results_root=str(tmp_path / "r"))
    # train: one datum per caption; lowercased, trailing period stripped
    assert len(ds.training_set) == 2
    assert ds.training_set[0].caption_txt == "a dog runs fast"
    assert ds.training_set[0].all_captions_txt == ("a dog runs fast", "the dog is running")
    assert len(ds.validation_set) == 1 and ds.validation_set[0].caption_txt == "a cat sits"
    assert len(ds.test_set) == 1 and ds.test_set[0].img_filename == "3.jpg"


def test_coco_parsing(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)

    def js(ids, extra_for=None):
        anns = [{"image_id": i, "caption": f"Caption number {i}."} for i in ids]
        if extra_for is not None:
            anns.append({"image_id": extra_for, "caption": "second caption"})
        return {
            "images": [{"id": i, "file_name": f"{i:04d}.jpg"} for i in ids],
            "annotations": anns,
        }

    (root / "annotations" / "captions_train2017.json").write_text(
        json.dumps(js([3, 1, 2], extra_for=1)))
    (root / "annotations" / "captions_val2017.json").write_text(json.dumps(js([9])))
    cfg = COCOConfig(dataset_root=str(root), train_size=2, val_size=1)
    ds = COCODataset(cfg, results_root=str(tmp_path / "r"))
    # sorted ids [1,2,3]: train = {1,2}, val = {3}; val2017 json = test
    train_files = {d.img_filename for d in ds.training_set}
    assert train_files == {"0001.jpg", "0002.jpg"}
    assert len(ds.training_set) == 3  # img 1 has two captions
    assert [d.img_filename for d in ds.validation_set] == ["0003.jpg"]
    assert [d.img_filename for d in ds.test_set] == ["0009.jpg"]
    assert ds.test_set[0].caption_txt == "caption number 9"


def test_karpathy_parsing(tmp_path):
    root = tmp_path / "k"
    root.mkdir()
    data = {"images": [
        {"filename": "a.jpg", "filepath": "train2014", "split": "train",
         "sentences": [{"raw": "One."}, {"raw": "Two"}]},
        {"filename": "b.jpg", "filepath": "train2014", "split": "restval",
         "sentences": [{"raw": "Three"}]},
        {"filename": "c.jpg", "filepath": "val2014", "split": "val",
         "sentences": [{"raw": "Four"}]},
        {"filename": "d.jpg", "filepath": "val2014", "split": "test",
         "sentences": [{"raw": "Five"}]},
    ]}
    (root / "dataset_coco.json").write_text(json.dumps(data))
    cfg = COCO2014Config(dataset_root=str(root))
    ds = COCODatasetKarpathy(cfg, results_root=str(tmp_path / "r"))
    assert len(ds.training_set) == 3  # train (2 caps) + restval (1)
    assert ds.training_set[0].caption_txt == "one"
    assert [d.img_filename for d in ds.validation_set] == ["c.jpg"]
    assert [d.img_filename for d in ds.test_set] == ["d.jpg"]
    assert ds.test_set[0].img_path.endswith(os.path.join("val2014", "d.jpg"))
