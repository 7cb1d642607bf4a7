"""Dedup kernel tests ported from /root/reference/tests/deduplicate_test.py."""

from mmkg_rag_spark.kernels.canonicalize import (
    deduplicate_sync,
    group_entities_greedy,
    group_relations,
    merge_entity_group,
    merge_relation_group,
)
from mmkg_rag_spark.kernels.records import Entity, Relation


def E(name, desc="d", label="person", aliases=None, **kw):
    return Entity(name=name, description=desc, label=label, aliases=aliases, **kw)


class TestGrouping:
    # deduplicate_test.py:15-59
    def test_same_name(self):
        result = group_entities_greedy([E("John", "desc1"), E("John", "desc2")])
        assert len(result) == 1 and len(result[0]) == 2

    def test_alias_match(self):
        result = group_entities_greedy(
            [E("John", aliases=["Johnny"]), E("Johnny")]
        )
        assert len(result) == 1 and len(result[0]) == 2

    def test_transitive(self):
        result = group_entities_greedy(
            [E("John", aliases=["Johnny"]), E("Johnny", aliases=["J"]), E("J")]
        )
        assert len(result) == 1 and len(result[0]) == 3

    def test_empty(self):
        assert group_entities_greedy([]) == []

    def test_disjoint(self):
        result = group_entities_greedy([E("John"), E("Jane")])
        assert len(result) == 2

    def test_case_insensitive(self):
        result = group_entities_greedy([E("John"), E("john")])
        assert len(result) == 1 and len(result[0]) == 2


class TestGroupRelations:
    # deduplicate_test.py:107-121
    def test_unordered_pair(self):
        r1 = Relation(source="John", target="Someone", label="knows")
        r2 = Relation(source="Someone", target="John", label="friend_of")
        result = group_relations([r1, r2])
        assert len(result) == 1 and len(result[0]) == 2

    def test_disjoint(self):
        r1 = Relation(source="John", target="Someone", label="knows")
        r2 = Relation(source="Jahn", target="Someone", label="knows")
        assert len(group_relations([r1, r2])) == 2


class TestMergePolicy:
    def test_merge_entity_longest_name(self):
        merged = merge_entity_group(
            [
                E("John", "desc1", aliases=["Johnny"], references=["r1"], chunks=[1]),
                E("Johnny", "desc2", aliases=["JS"], references=["r2"], chunks=[2]),
            ]
        )
        assert merged.name == "Johnny"
        assert merged.aliases == ["JS", "John"]
        assert merged.references == ["r1", "r2"]
        assert merged.chunks == [1, 2]
        assert "desc1" in merged.description and "desc2" in merged.description

    def test_merge_entity_label_majority(self):
        merged = merge_entity_group([E("A", label="x"), E("A", label="y"), E("Ab", label="y")])
        assert merged.label == "y"

    def test_merge_relation_collapses_identical_triples(self):
        rows = [
            Relation(source="A", target="B", label="knows", references=["r1"], chunks=[1]),
            Relation(source="A", target="B", label="knows", references=["r2"], chunks=[2]),
            Relation(source="B", target="A", label="likes"),
        ]
        merged = merge_relation_group(rows)
        assert len(merged) == 2
        knows = next(r for r in merged if r.label == "knows")
        assert knows.references == ["r1", "r2"] and knows.chunks == [1, 2]


class TestDeduplicateSync:
    # mirrors deduplicate_test.py:61-105 with the deterministic merge policy
    def test_merge_and_remap(self):
        e1 = E("John", "desc1", aliases=["Johnny"], chunks=[1], references=["ref1"])
        e2 = E("Johnny", "desc2", aliases=["JS"], chunks=[2], references=["ref2"])
        r1 = Relation(source="John", target="Someone", label="knows")
        r2 = Relation(source="Someone", target="Johnny", label="friend_of")
        entities, relations = deduplicate_sync([e1, e2], [r1, r2])
        assert len(entities) == 1
        merged = entities[0]
        assert merged.name == "Johnny"  # longest member name
        assert merged.label == "person"
        assert len(relations) == 2
        by_label = {r.label: r for r in relations}
        assert by_label["knows"].source == "Johnny"
        assert by_label["friend_of"].target == "Johnny"

    def test_aliases_backfilled(self):
        entities, _ = deduplicate_sync([E("Solo")], [])
        assert entities[0].aliases == []
