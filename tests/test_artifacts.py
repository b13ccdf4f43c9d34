"""Unit contract for jobx_spark.artifacts: the version-pointer layout
and the Hadoop-FS-first probes (VERDICT r10 #5/#7)."""

import os

from jobx_spark import artifacts as A


def test_unpublished_root_resolves_none(tmp_path):
    root = str(tmp_path / "art")
    os.makedirs(root)
    assert A.current_version(None, root) is None
    assert A.resolve(None, root) is None


def test_publish_flips_pointer_and_keeps_two_versions(tmp_path):
    root = str(tmp_path / "art")
    os.makedirs(root)
    for v in (1, 2, 3):
        n, vdir = A.next_version_dir(None, root)
        assert n == v
        os.makedirs(vdir)
        with open(os.path.join(vdir, "data"), "w") as f:
            f.write(str(v))
        A.publish(None, root, n)
        assert A.current_version(None, root) == v
    # retention: v=3 current, v=2 pinned-reader safe, v=1 pruned
    assert os.path.isdir(A.version_dir(root, 3))
    assert os.path.isdir(A.version_dir(root, 2))
    assert not os.path.exists(A.version_dir(root, 1))


def test_unpublished_dir_is_invisible_and_reused(tmp_path):
    """A writer crash AFTER materializing v=1 but BEFORE publishing
    must leave readers on 'never published' and the next writer must
    clear the leftover."""
    root = str(tmp_path / "art")
    os.makedirs(root)
    n, vdir = A.next_version_dir(None, root)
    os.makedirs(vdir)
    with open(os.path.join(vdir, "partial"), "w") as f:
        f.write("half-written")
    # crash here: no publish
    assert A.resolve(None, root) is None
    n2, vdir2 = A.next_version_dir(None, root)
    assert n2 == 1 and vdir2 == vdir
    assert not os.path.exists(os.path.join(vdir, "partial"))


def test_fs_probes_use_hadoop_api_for_local_paths(spark, tmp_path):
    """With a live session the probes must go through the JVM Hadoop
    FileSystem (the path a cluster warehouse takes), and agree with
    the local filesystem on file:// paths."""
    p = str(tmp_path / "probe.txt")
    assert not A.fs_exists(spark, p)
    A._touch(spark, p)
    assert os.path.exists(p), "JVM touch must land on the local FS"
    assert A.fs_exists(spark, p)
    A._delete(spark, p)
    assert not os.path.exists(p)
    # and the marker listing sees JVM-created pointers
    root = str(tmp_path / "art")
    os.makedirs(root)
    A.publish(spark, root, 1)
    assert A.current_version(spark, root) == 1
    assert A.current_version(None, root) == 1  # os fallback agrees
