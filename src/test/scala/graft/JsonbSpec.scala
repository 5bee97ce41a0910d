package graft

/** The jsonb family (functions/JsonbExpressions.scala): canonical mz
  * rendering, accessors, containment, builders, table functions. */
class JsonbSpec extends SparkSpec {

  private def one(q: String): Any = spark.sql(q).first.get(0)

  test("jsonb_canon: compact render, bytewise key sort, last-dup wins") {
    assert(one("""SELECT jsonb_canon('{"b": 1, "a": {"y":2, "x":[1, 2]}}')""")
      == """{"a":{"x":[1,2],"y":2},"b":1}""")
    assert(one("""SELECT jsonb_canon('{"a": 1, "a": 3}')""") == """{"a":3}""")
    assert(one("""SELECT jsonb_canon('{"1.3": 1, "33": 2}')""")
      == """{"1.3":1,"33":2}""") // plain byte order, NOT pg length-first
    assert(one("SELECT jsonb_canon('1e2')") == "100")
  }

  test("jsonb accessors: get / get_text / path / scalar-as-array") {
    assert(one("""SELECT jsonb_get(jsonb_canon('{"a":{"b":"x"}}'), 'a')""") == """{"b":"x"}""")
    assert(one("""SELECT jsonb_get_text(jsonb_canon('{"a":"x"}'), 'a')""") == "x")
    assert(one("""SELECT jsonb_get(jsonb_canon('[1,2,3]'), -1)""") == "3")
    assert(one("""SELECT jsonb_get(jsonb_canon('[1,2,3]'), '0')""") == null)
    assert(one("""SELECT jsonb_get(jsonb_canon('true'), 0)""") == "true")
    assert(one("""SELECT jsonb_get_path(jsonb_canon('{"a":[10,20]}'), '{a,1}')""") == "20")
  }

  test("jsonb containment / exists / concat / delete") {
    assert(one("""SELECT jsonb_contains(jsonb_canon('{"a":1,"b":2}'), '{"a":1}')""") == true)
    assert(one("""SELECT jsonb_contains(jsonb_canon('[1,2]'), '3')""") == false)
    assert(one("""SELECT jsonb_exists(jsonb_canon('{"a":1}'), 'a')""") == true)
    assert(one("""SELECT jsonb_concat(jsonb_canon('{"a":1}'), jsonb_canon('{"a":2,"b":3}'))""")
      == """{"a":2,"b":3}""")
    assert(one("""SELECT jsonb_concat(jsonb_canon('{"a":1}'), jsonb_canon('"s"'))""") == null)
    // reference arms (func.rs:1944): array beside any value appends/prepends
    assert(one("""SELECT jsonb_concat(jsonb_canon('[1]'), jsonb_canon('{"a":1}'))""")
      == """[1,{"a":1}]""")
    assert(one("""SELECT jsonb_concat(jsonb_canon('{"a":1}'), jsonb_canon('[2]'))""")
      == """[{"a":1},2]""")
    assert(one("""SELECT jsonb_concat(jsonb_canon('[1]'), jsonb_canon('2'))""") == "[1,2]")
    // no arm without an array or a two-object merge: scalar||scalar is NULL
    assert(one("""SELECT jsonb_concat(jsonb_canon('1'), jsonb_canon('"s"'))""") == null)
    assert(one("""SELECT jsonb_delete(jsonb_canon('{"a":1,"b":2}'), 'a')""") == """{"b":2}""")
    assert(one("""SELECT jsonb_delete(jsonb_canon('[1,2,3]'), 0)""") == "[2,3]")
    assert(one("""SELECT jsonb_delete(jsonb_canon('3'), 'b')""") == null)
  }

  test("jsonb builders embed nested jsonb raw; table functions explode") {
    assert(one("""SELECT jsonb_build_array(1, jsonb_canon('{"x":1}'), 's')""")
      == """[1,{"x":1},"s"]""")
    assert(one("""SELECT jsonb_build_object('k', jsonb_canon('[1]'), 'n', NULL)""")
      == """{"k":[1],"n":null}""")
    assert(one("SELECT to_jsonb(jsonb_canon('\"a\"'))") == "\"a\"")
    assert(one("SELECT to_jsonb('a')") == "\"a\"")
    assert(spark.sql("SELECT * FROM jsonb_array_elements('[1,{\"a\":2}]')")
      .collect().map(_.getString(0)).toSeq == Seq("1", """{"a":2}"""))
    assert(spark.sql("SELECT * FROM jsonb_object_keys('{\"b\":1,\"a\":2}')")
      .collect().map(_.getString(0)).toSeq == Seq("b", "a"))
  }
}
