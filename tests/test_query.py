import jax
import numpy as np
import pytest

from holoagent_tpu.memory.nodes import Floor, Object, Room, View
from holoagent_tpu.memory.hmsg import HMSGraph
from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models.tokenizer import SimpleTokenizer
from holoagent_tpu.query import FSRQueryEngine, RuleParser, ClipVLM, NullVLM
from holoagent_tpu.query.parser import LLMParser


def test_rule_parser_full():
    p = RuleParser()
    q = p("mirror in region bathroom on floor 2")
    assert q.astuple() == ("2", "bathroom", "mirror")
    q = p("find the sofa in the living room")
    assert q.room == "living room" and q.object == "sofa" and q.floor is None
    q = p("go to the red chair")
    assert q.object == "red chair" and q.room is None
    q = p("take me to the kitchen sink on the second floor")
    assert q.floor == "2"


def test_llm_parser_with_backend_and_fallback():
    def backend(system, prompt):
        return "[Floor 1, Living Room, sofa]"

    p = LLMParser(backend)
    q = p("whatever")
    assert q.astuple() == ("Floor 1", "Living Room", "sofa")

    def broken(system, prompt):
        raise RuntimeError("down")

    p2 = LLMParser(broken)
    q2 = p2("sofa in the living room on floor 1")
    assert q2.object == "sofa"


@pytest.fixture(scope="module")
def synthetic_graph():
    """Hand-built HMSG with separable embeddings so retrieval is checkable."""
    rng = np.random.default_rng(0)
    d = 32

    def unit(i):
        v = np.zeros(d, np.float32)
        v[i] = 1.0
        return v

    g = HMSGraph()
    fl = Floor("0", name="floor_0")
    fl.floor_zero_level, fl.floor_height = 0.0, 2.5
    fl.pcd_points = rng.uniform(0, 5, (100, 3)).astype(np.float64)
    fl.pcd_colors = np.zeros((100, 3), np.float32)
    fl.vertices = np.zeros((8, 3))
    g.floors.append(fl)
    for ri in range(2):
        r = Room(f"0_{ri}", "0", name=["living room", "bathroom"][ri])
        r.pcd_points = rng.uniform(0, 2, (50, 3))
        r.pcd_colors = np.zeros((50, 3))
        r.vertices = r.pcd_points[:, :2]
        r.room_zero_level, r.room_height = 0.0, 2.5
        r.embeddings = [unit(10 + ri)]
        r.sample_images = [ri * 2]
        r.clip_embeddings = [unit(10 + ri)]
        fl.add_room(r)
        g.rooms.append(r)
        view = View(f"0_{ri}_{ri}", r.room_id, img_id=ri * 2)
        r.views.append(view)
        g.views.append(view)
        for oi in range(2):
            o = Object(f"0_{ri}_{oi}", r.room_id, name=f"obj{ri}{oi}")
            o.pcd_points = rng.uniform(0, 2, (20, 3))
            o.pcd_colors = np.zeros((20, 3))
            o.vertices = o.pcd_points[:, :2]
            o.embedding = unit(ri * 2 + oi)
            o.best_view_id = view.view_id
            o.view_ids = [view.view_id]
            view.object_ids.append(o.object_id)
            r.add_object(o)
            g.objects.append(o)
    g._build_nx()
    return g


class FakeTextEngine(FSRQueryEngine):
    """Overrides CLIP text features with deterministic unit vectors so the
    retrieval logic itself is what's under test."""

    TEXT_DIRS = {
        "living room": 10, "bathroom": 11,
        "lamp": 0, "mug": 1, "plant": 2, "towel": 3,
        "background": 20,
    }

    def text_feats(self, texts):
        d = 32
        out = np.zeros((len(texts), d), np.float32)
        for i, t in enumerate(texts):
            key = t.lower()
            if key.startswith("floor"):
                out[i, 25 + int(key.split()[-1]) % 4] = 1.0
            else:
                out[i, self.TEXT_DIRS.get(key, 24)] = 1.0
        return out


@pytest.fixture(scope="module")
def engine(synthetic_graph):
    variant = clip_mod.VARIANTS["test-tiny"]
    images = {i: np.zeros((8, 8, 3), np.float32) for i in range(8)}
    return FakeTextEngine(
        synthetic_graph,
        clip_params=None,
        tokenizer=None,
        variant=variant,
        image_provider=lambda i: images[i],
        vlm=NullVLM(),
    )


def test_query_room_label(engine):
    ids = engine.query_room("bathroom", floor_id=0, method="label")
    assert engine.g.floors[0].rooms[ids[0]].name == "bathroom"


def test_query_object_in_room(engine):
    # "towel" = unit(3) = object 0_1_1 (ri=1, oi=1)
    ids, rids, scores = engine.query_object(
        "towel", floor_id=0, room_ids=[1], top_k=1, negative_prompt=["background"]
    )
    assert engine.g.objects[ids[0]].object_id == "0_1_1"
    assert scores[0] > 0.9


def test_query_object_negative_filter(engine):
    # an object whose best class is 'background' must be excluded
    g = engine.g
    g.objects[0].embedding = np.zeros(32, np.float32)
    g.objects[0].embedding[20] = 1.0  # looks like background
    ids, _, scores = engine.query_object(
        "lamp", floor_id=0, room_ids=[0, 1], top_k=4, negative_prompt=["background"]
    )
    assert all(g.objects[i].object_id != "0_0_0" for i in ids)
    # restore
    e = np.zeros(32, np.float32)
    e[0] = 1.0
    g.objects[0].embedding = e


def test_query_hierarchy_fast(engine):
    floor, rooms, objs, res = engine.query_hierarchy(
        "mug in region living room on floor 1"
    )
    assert floor is engine.g.floors[0]
    assert rooms and rooms[0].name == "living room"
    assert objs and objs[0].object_id == "0_0_1"
    for k in ("LLM_Parse_Time", "FastMatching", "ObjectInImageCheck",
              "VLM_Rethinking", "Re_Matching", "Total_Time"):
        assert k in res


def test_query_hierarchy_slow_with_nullvlm(engine):
    floor, rooms, objs, res = engine.query_hierarchy(
        "towel in region bathroom on floor 1", use_slow=True
    )
    assert objs and objs[0].object_id == "0_1_1"
    assert res["ObjectInImageCheck"] >= 0.0
    assert res["Total_Time"] >= res["FastMatching"]


def test_clip_vlm_backend():
    variant = clip_mod.VARIANTS["test-tiny"]
    params = clip_mod.init_clip(jax.random.key(0), variant)
    tok = SimpleTokenizer()
    vlm = ClipVLM(params, tok, variant, detect_threshold=-1.0)  # random init: accept
    img = np.zeros((16, 16, 3), np.float32)
    assert vlm.detect_object(img, "chair") in (True, False)
    assert vlm.choose_frame([img, img], "a chair") in (0, 1)
    checks, best = vlm.detect_and_select_best([img, img], "chair")
    assert len(checks) == 2 and best in (0, 1)


def test_llm_client_cache_and_retry(tmp_path):
    from holoagent_tpu.query.llm_client import CachedLLMClient, Conversation

    calls = []

    def backend(messages):
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("flaky")
        return "[Floor 1, Kitchen, sink]"

    c = CachedLLMClient(backend, cache_path=tmp_path / "cache.jsonl",
                        max_retries=5, backoff_s=0.0)
    conv = Conversation().system("parse").user("sink in the kitchen on floor 1")
    out = c.send_query(conv)
    assert out == "[Floor 1, Kitchen, sink]"
    assert len(calls) == 3  # two failures retried
    # cache hit: no new backend call
    assert c.send_query(conv) == out
    assert len(calls) == 3
    # persistent across instances
    c2 = CachedLLMClient(backend, cache_path=tmp_path / "cache.jsonl")
    assert c2.send_query(conv) == out
    assert len(calls) == 3


def test_llm_client_bounded_failure():
    from holoagent_tpu.query.llm_client import CachedLLMClient

    def broken(messages):
        raise ConnectionError("down")

    c = CachedLLMClient(broken, max_retries=2, backoff_s=0.0)
    with pytest.raises(RuntimeError):
        c.send_query([{"role": "user", "content": "hi"}])


def test_slow_path_refinement_persists_objects_update(synthetic_graph, tmp_path):
    """A VLM that rejects the fast pick and selects another view triggers
    Re_Matching; the refined object is persisted to objects_update/ (the
    reference mutates the saved graph the same way, graph.py:2999-3006)."""

    class RefiningVLM:
        def detect_object(self, image, label):
            return False  # fast pick rejected -> rethinking engages

        def choose_frame(self, images, instruction):
            return 0

        def detect_and_select_best(self, images, label):
            # reject candidate 0, accept candidate 1 (the clip-best view)
            return [False] + [True] * (len(images) - 1), 1

    variant = clip_mod.VARIANTS["test-tiny"]
    images = {i: np.zeros((8, 8, 3), np.float32) for i in range(8)}
    eng = FakeTextEngine(
        synthetic_graph,
        clip_params=None,
        tokenizer=None,
        variant=variant,
        image_provider=lambda i: images[i],
        vlm=RefiningVLM(),
        update_dir=str(tmp_path),
    )
    floor, rooms, objs, res = eng.query_hierarchy(
        "towel in region bathroom on floor 1", use_slow=True
    )
    assert "refined_object_id" in res
    upd = tmp_path / "objects_update"
    oid = res["refined_object_id"]
    assert (upd / f"{oid}.ply").exists() and (upd / f"{oid}.json").exists()


def test_rule_parser_chinese():
    """zh query shapes (the reference's zh prompt variants,
    llm_utils.py:310-466)."""
    p = RuleParser()
    # known nouns canonicalize to the English label vocabulary (the role GPT
    # translation plays in the reference's zh parse); unknown nouns pass
    # through for open-vocabulary retrieval
    assert p("去二楼的厨房找椅子").astuple() == ("2", "kitchen", "chair")
    assert p("在卧室里找台灯").astuple() == (None, "bedroom", "lamp")
    assert p("带我去沙发").astuple() == (None, None, "sofa")
    assert p("请帮我去三楼的会议室找投影仪").astuple() == ("3", "会议室", "投影仪")
    assert p("在客厅里的电视。").astuple() == (None, "living room", "tv")
    # politeness prefixes and compound numerals
    assert p("请在卧室里找台灯").astuple() == (None, "bedroom", "lamp")
    assert p("帮我在厨房找勺子").astuple() == (None, "kitchen", "勺子")
    assert p("去十二楼找椅子").astuple() == ("12", None, "chair")
    assert p("去二十三层的办公室找打印机").astuple() == ("23", "办公室", "打印机")


# ---------------------------------------------------------------------------
# Slow-path quality benchmark with the GT-backed oracle VLM
# (reference role fidelity for query_room_obj_slow_reasoning, graph.py:2578-3054)
# ---------------------------------------------------------------------------


def _confusable_graph():
    """Scene where CLIP-confusable decoys break the fast path: the living room
    holds a 'shiny cloth' whose embedding looks exactly like text 'towel' and
    a 'green sculpture' that looks like 'plant'; the real towel/plant live in
    the bathroom with weaker (0.8) text similarity."""
    rng = np.random.default_rng(7)

    def unit(i, d=32):
        v = np.zeros(d, np.float32)
        v[i] = 1.0
        return v

    def mix(i, j, wi=0.8):
        v = wi * unit(i) + np.sqrt(1 - wi * wi) * unit(j)
        return (v / np.linalg.norm(v)).astype(np.float32)

    g = HMSGraph()
    fl = Floor("0", name="floor_0")
    fl.floor_zero_level, fl.floor_height = 0.0, 2.5
    fl.pcd_points = rng.uniform(0, 5, (100, 3)).astype(np.float64)
    fl.pcd_colors = np.zeros((100, 3), np.float32)
    fl.vertices = np.zeros((8, 3))
    g.floors.append(fl)

    spec = {
        0: ("living room", 0, [("lamp", unit(0)), ("mug", unit(1)),
                               ("shiny cloth", unit(3)), ("green sculpture", unit(2))],
            unit(10)),
        1: ("bathroom", 2, [("towel", mix(3, 9)), ("plant", mix(2, 9))],
            (unit(3) + unit(2)) / np.sqrt(2)),
    }
    frame_contents = {}
    for ri, (name, img, objs, memb) in spec.items():
        r = Room(f"0_{ri}", "0", name=name)
        r.pcd_points = rng.uniform(0, 2, (50, 3))
        r.pcd_colors = np.zeros((50, 3))
        r.vertices = r.pcd_points[:, :2]
        r.room_zero_level, r.room_height = 0.0, 2.5
        r.embeddings = [unit(10 + ri)]
        r.sample_images = [img]
        r.clip_embeddings = [memb.astype(np.float32)]
        fl.add_room(r)
        g.rooms.append(r)
        view = View(f"0_{ri}_v", r.room_id, img_id=img)
        r.views.append(view)
        g.views.append(view)
        frame_contents[img] = set()
        for oi, (oname, emb) in enumerate(objs):
            o = Object(f"0_{ri}_{oi}", r.room_id, name=oname)
            o.pcd_points = rng.uniform(0, 2, (20, 3))
            o.pcd_colors = np.zeros((20, 3))
            o.vertices = o.pcd_points[:, :2]
            o.embedding = emb
            o.best_view_id = view.view_id
            o.view_ids = [view.view_id]
            view.object_ids.append(o.object_id)
            r.add_object(o)
            g.objects.append(o)
            frame_contents[img].add(oname)
    g._build_nx()
    return g, frame_contents


def test_slow_path_oracle_improves_retrieval():
    """Retrieval accuracy benchmark: on CLIP-confusable queries the fast path
    picks the decoy; the slow path (oracle VLM standing in for a loaded
    checkpoint) must correct it without regressing clean queries."""
    from holoagent_tpu.query import OracleVLM, tag_image

    g, frame_contents = _confusable_graph()
    oracle = OracleVLM(frame_contents)
    variant = clip_mod.VARIANTS["test-tiny"]
    provider = lambda i: tag_image(np.zeros((8, 8, 3), np.float32), i)
    eng = FakeTextEngine(
        g, clip_params=None, tokenizer=None, variant=variant,
        image_provider=provider, vlm=oracle,
    )
    queries = [
        ("find the towel", "towel"),     # decoy trap
        ("find the plant", "plant"),     # decoy trap
        ("find the mug", "mug"),         # clean
    ]

    def accuracy(use_slow):
        hits = 0
        for instr, want in queries:
            _, _, objs, _ = eng.query_hierarchy(instr, use_slow=use_slow)
            hits += bool(objs and objs[0].name == want)
        return hits / len(queries)

    acc_fast = accuracy(False)
    acc_slow = accuracy(True)
    assert acc_fast < 1.0            # the decoys really break the fast path
    assert acc_slow > acc_fast       # FSR: slow reasoning corrects it
    assert acc_slow == 1.0
    # the oracle was actually consulted through all three call shapes
    kinds = {k for k, _ in oracle.calls}
    assert kinds == {"detect_object", "choose_frame", "detect_and_select_best"}


def test_oracle_distill_pairs():
    from holoagent_tpu.query import OracleVLM

    oracle = OracleVLM({0: {"mug"}, 2: {"towel"}})
    pairs = oracle.distill_pairs([0, 2], ["mug", "towel"])
    ans = {(p[1][0], p[0].split(" a ")[1].split(" in")[0]): p[2] for p in pairs}
    assert ans[(0, "mug")] == "yes" and ans[(0, "towel")] == "no"
    assert ans[(2, "towel")] == "yes" and ans[(2, "mug")] == "no"


def test_device_retrieval_matches_numpy_path():
    """Large floor-wide galleries (>=512 objects) score on-device via
    ops.retrieval.negative_prompt_topk; results must match the host numpy
    semantics exactly (class-argmax gate, max-class ranking)."""
    rng = np.random.default_rng(3)
    d = 32
    g = HMSGraph()
    fl = Floor("0", name="floor_0")
    fl.floor_zero_level, fl.floor_height = 0.0, 2.5
    fl.pcd_points = np.zeros((4, 3))
    fl.pcd_colors = np.zeros((4, 3))
    fl.vertices = np.zeros((8, 3))
    g.floors.append(fl)
    r = Room("0_0", "0", name="living room")
    r.pcd_points = np.zeros((4, 3)); r.pcd_colors = np.zeros((4, 3))
    r.vertices = np.zeros((4, 2)); r.room_zero_level, r.room_height = 0.0, 2.5
    fl.add_room(r); g.rooms.append(r)
    n = 600
    embs = rng.normal(0, 1, (n, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    for i in range(n):
        o = Object(f"0_0_{i}", "0_0", name=f"obj{i}")
        o.pcd_points = np.zeros((3, 3)); o.pcd_colors = np.zeros((3, 3))
        o.vertices = np.zeros((3, 2)); o.embedding = embs[i]
        r.add_object(o); g.objects.append(o)
    g._build_nx()

    eng = FakeTextEngine(g, clip_params=None, tokenizer=None,
                         variant=clip_mod.VARIANTS["test-tiny"])
    idx, rooms, scores = eng.query_object(
        "lamp", floor_id=-1, top_k=5, negative_prompt=["background", "mug"]
    )
    # reference numpy computation with the same text features
    tf = eng.text_feats(["lamp", "background", "mug"])
    sim = tf @ embs.T
    cls = np.argmax(sim, axis=0)
    eligible = np.where(cls == 0)[0]
    if len(eligible):
        want = eligible[np.argsort(-np.max(sim, axis=0)[eligible])][:5]
    else:
        want = np.argsort(-sim[0])[:5]
    assert list(idx) == [int(i) for i in want], (idx, want[:5])
    np.testing.assert_allclose(scores, sim[0][want], atol=1e-4)


def test_query_floor_integer_indexing(engine):
    """1-indexed integer floor parse ('floor 1' = lowest storey, reference
    graph.py:2236), with a literal 0 also meaning the lowest storey instead
    of wrapping to the top floor via order[-1]."""
    n = len(engine.g.floors)
    zero = [f.floor_zero_level for f in engine.g.floors]
    order = np.argsort(zero)
    assert engine.query_floor("1") == int(order[0])
    assert engine.query_floor("0") == int(order[0])  # no order[-1] wrap
    if n > 1:
        assert engine.query_floor("2") == int(order[1])
