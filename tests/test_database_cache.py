"""CorrespondenceGraph + DatabaseCache tests (ref style:
base/correspondence_graph_test.cc, base/database_cache_test.cc)."""

import numpy as np

from sba_tpu.io.database import Database
from sba_tpu.io.database_cache import CorrespondenceGraph, DatabaseCache


def test_correspondence_graph_basic():
    g = CorrespondenceGraph()
    g.add_image(1, 4)
    g.add_image(2, 4)
    g.add_image(3, 4)
    g.add_correspondences(1, 2, np.array([[0, 0], [1, 1]]))
    g.add_correspondences(2, 3, np.array([[0, 2], [1, 3]]))
    g.finalize()

    assert g.num_correspondences_between_images(1, 2) == 2
    assert g.num_correspondences_between_images(2, 1) == 2
    assert g.num_correspondences_between_images(1, 3) == 0

    c = g.find_correspondences(1, 0)
    assert c.shape == (1, 2)
    assert tuple(c[0]) == (2, 0)
    # reverse direction
    c2 = g.find_correspondences(2, 0)
    assert set(map(tuple, c2)) == {(1, 0), (3, 2)}
    assert g.find_correspondences(1, 3).shape == (0, 2)

    assert g.num_observations_for_image(1) == 2
    assert g.num_correspondences_for_image(2) == 4


def test_transitive_correspondences():
    g = CorrespondenceGraph()
    for i in (1, 2, 3):
        g.add_image(i, 2)
    g.add_correspondences(1, 2, np.array([[0, 0]]))
    g.add_correspondences(2, 3, np.array([[0, 1]]))
    g.finalize()
    t1 = g.find_transitive_correspondences(1, 0, transitivity=1)
    assert set(map(tuple, t1)) == {(2, 0)}
    t2 = g.find_transitive_correspondences(1, 0, transitivity=2)
    assert set(map(tuple, t2)) == {(2, 0), (3, 1)}


def test_duplicate_matches_deduped():
    g = CorrespondenceGraph()
    g.add_image(1, 2)
    g.add_image(2, 2)
    g.add_correspondences(1, 2, np.array([[0, 0]]))
    g.add_correspondences(2, 1, np.array([[0, 0]]))  # same pair reversed
    g.finalize()
    assert g.num_correspondences_between_images(1, 2) == 1


def test_database_cache_create():
    with Database() as db:
        cid = db.write_camera(0, 64, 64, [50, 32, 32])
        ids = [db.write_image(f"im{k}.png", cid) for k in range(3)]
        rng = np.random.default_rng(0)
        for iid in ids:
            db.write_keypoints(iid, rng.uniform(0, 64, (30, 4)).astype(np.float32))
        big = np.stack([np.arange(20), np.arange(20)], -1)
        small = big[:3]
        db.write_two_view_geometry(ids[0], ids[1], big, config=2)
        db.write_two_view_geometry(ids[1], ids[2], small, config=2)  # < min
        db.write_two_view_geometry(ids[0], ids[2], big, config=7)    # watermark

        cache = DatabaseCache.create(db, min_num_matches=15)
        assert cache.num_images() == 3
        g = cache.correspondence_graph
        assert g.num_correspondences_between_images(ids[0], ids[1]) == 20
        assert g.num_correspondences_between_images(ids[1], ids[2]) == 0
        assert g.num_correspondences_between_images(ids[0], ids[2]) == 0
        assert cache.images[ids[0]].num_observations == 20
