#pragma once
namespace cereal {
class access {
 public:
  template <class T, class A>
  static void serialize(A& ar, T& t) {
    t.serialize(ar);
  }
};
}  // namespace cereal
